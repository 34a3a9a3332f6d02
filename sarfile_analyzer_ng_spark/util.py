"""Cross-engine helpers shared by operators and the oracle registry."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rnd(col: Column, digits: int = 4) -> Column:
    """Portable rounding for *computed* float aggregates (sum/avg/std/
    corr/percentile/cosine …).

    Different engines sum in different orders, so two correct results
    can differ by an ulp — and when the true value sits exactly on a
    rounding half-boundary (common for data generated with 2-decimal
    values), plain ``round`` flips the last digit between engines.
    Pre-rounding at 8 digits collapses both results to the same value
    first. Plain min/max/passthrough values don't need this (no
    arithmetic → bit-identical inputs).
    """
    return F.round(F.round(col, 8), digits)


def sql_rnd(expr: str, digits: int = 4) -> str:
    """The DuckDB-side twin of :func:`rnd` for oracle SQL strings."""
    return f"round(round({expr}, 8), {digits})"
