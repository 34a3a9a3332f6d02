from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sarfile_analyzer_ng_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    spark = get_spark("tests", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (r12 VERDICT item 3): the DRIVER-FACING GATE is
    the modules marked ``pytest.mark.driver`` — entry contract,
    rotation, tail staleness, plan asserts, the full 50-key oracle
    parity window, the API facade, IO/store, the SAR source and the
    differential fuzzers (~8 min standalone; the full 758-test suite
    is 55–85 min, which the external driver's budget cannot finish —
    VERIFY_r12 died at ~84% with zero failures). Everything else is a
    builder-session test, skipped by default and enabled with
    ``SPARK_GRAFT_FULL_TESTS=1`` (builder sessions MUST run the full
    suite before shipping a round)."""
    if os.environ.get("SPARK_GRAFT_FULL_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="builder-session test; set SPARK_GRAFT_FULL_TESTS=1"
    )
    for item in items:
        if item.get_closest_marker("driver") is None:
            item.add_marker(skip)
