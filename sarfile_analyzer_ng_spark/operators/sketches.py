"""Sketch/approximate statistics: the 100 TB replacements for the
exact operators.

The exact forms (describe, percentiles, countDistinct) are what the
oracle gate verifies; these are their bounded-memory, one-pass
equivalents for interactive use at full scale. Each sketch documents
what it trades: HLL++ (relative error ~rsd), KLL-style quantiles
(rank error ~1/accuracy), deterministic hash sampling (exact
reproducibility, approximate fraction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct(df: DataFrame, col: str, by: list[str],
                    rsd: float = 0.05) -> DataFrame:
    """HLL++ distinct count per group: constant memory per group vs
    countDistinct's exact-but-shuffled set. rsd = relative std dev."""
    return df.groupBy(*by).agg(
        F.approx_count_distinct(col, rsd).alias(f"approx_distinct_{col}")
    )


def approx_percentiles(df: DataFrame, value_col: str, by: list[str],
                       probs: tuple[float, ...] = (0.25, 0.5, 0.75),
                       accuracy: int = 10_000) -> DataFrame:
    """Mergeable quantile sketch per group — bounded memory, one pass;
    rank error ≤ 1/accuracy (vs stats.percentiles' exact sort)."""
    probs_sql = ", ".join(str(p) for p in probs)
    agg = F.expr(
        f"percentile_approx(`{value_col}`, array({probs_sql}), {accuracy})"
    ).alias("_q")
    out = df.groupBy(*by).agg(agg)
    return out.select(
        *by,
        *[F.col("_q").getItem(i).alias(f"p{int(p * 100)}")
          for i, p in enumerate(probs)],
    )


def hash_sample(df: DataFrame, key_col: str, percent: int,
                seed: int = 0) -> DataFrame:
    """Deterministic ~percent% sample by key hash: reproducible across
    runs/engines/partitions, and consistent per key (every row of a
    sampled key is kept — correct for per-entity sampling)."""
    bucket = F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(100))
    return df.where(bucket < percent)


def frequent_items(df: DataFrame, col: str, support: float = 0.01) -> DataFrame:
    """Heavy hitters with frequency above ``support`` — the skew
    diagnosis tool (which device/key needs salting). Spark's
    single-pass FreqItems (Karp et al); may contain false positives,
    never false negatives."""
    return df.freqItems([col], support)
