"""The t2 gate, locally: every registry query vs its DuckDB oracle on
sf0.001 (same comparison the driver applies at sf0.01)."""

from __future__ import annotations


import pytest

from sarfile_analyzer_ng_spark.queries import REGISTRY
from tools.check_oracle import compare, duck_conn

pytestmark = pytest.mark.driver  # driver-facing gate (see conftest)

from .conftest import SF_DIR

ORACLE_KEYS = [k for k, (_, sql) in REGISTRY.items() if sql is not None]


@pytest.fixture(scope="module")
def duck():
    return duck_conn(SF_DIR)


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_query_matches_oracle(spark, duck, key):
    fn, sql = REGISTRY[key]
    spark_pdf = fn(spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(sql).df()
    issues = compare(key, spark_pdf, duck_pdf)
    assert not issues, f"{key}: {issues}"


def test_no_rows_only_queries_remain(spark):
    """Since r8 EVERY registry key carries a SQL oracle — this pins
    that invariant (it used to parametrize the rows-only keys, which
    as an empty parameter set read as a perpetual pytest 'skip' in
    the suite summary). If a rows-only key ever reappears, it must
    still at least RUN."""
    rows_only = [k for k in REGISTRY if k not in ORACLE_KEYS]
    assert rows_only == [], (
        f"rows-only keys reappeared: {rows_only} — oracle them or "
        "extend this test to smoke-run them"
    )


def test_compare_flags_int_vs_float_dtype_class():
    """The r8 q119 failure shape: values equal after coercion but one
    engine hands pandas float64 for an integer column (DuckDB HUGEINT
    from an uncast sum over a UNION). The driver's hash is
    dtype-sensitive, so the local gate must flag it."""
    import pandas as pd

    from tools.check_oracle import compare as cmp

    s = pd.DataFrame({"k": ["a"], "n_tokens": pd.Series([42], dtype="int64")})
    d = pd.DataFrame({"k": ["a"], "n_tokens": pd.Series([42.0], dtype="float64")})
    issues = cmp("synthetic", s, d)
    assert any("dtype-class" in i for i in issues), issues
    assert not cmp("synthetic", s, s.copy())
