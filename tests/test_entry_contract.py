"""The driver contract: entry() returns rows, every queries() key has a
callable, oracle keys are a subset, and results carry stable schemas."""

from __future__ import annotations


import __spark_entry__ as entry_mod
import pytest

pytestmark = pytest.mark.driver  # driver-facing gate (see conftest)


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "sum_qty" in df.columns


def test_registry_shape(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) <= set(qs)
    # r8: the last five rows-only keys graduated to full value-hash
    # oracles — q31/q32 via the md5+affine portable hash families,
    # q36 via seeded dyadic literal planes, q50 via the q54
    # bound-gate form, q90 via the unrolled list_reduce merge chain.
    # EVERY registry key now has a SQL oracle; keep it that way.
    rows_only = set(qs) - set(oracles)
    assert rows_only == set()
