"""The t2 gate, locally: every registry query vs its DuckDB oracle on
sf0.001 (same comparison the driver applies at sf0.01)."""

from __future__ import annotations

import pytest

from sarfile_analyzer_ng_spark.queries import REGISTRY
from tools.check_oracle import compare, duck_conn

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


@pytest.mark.parametrize("key", [k for k in REGISTRY if k not in ORACLE_KEYS])
def test_rows_only_queries_run(spark, key):
    fn, _ = REGISTRY[key]
    assert fn(spark, SF_DIR).count() >= 0
