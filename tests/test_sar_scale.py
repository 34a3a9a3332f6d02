"""Scale behavior of the SAR source: files are the unit of
parallelism — N files must fan out to N parse tasks, and per-file
results must be independent of how many files share the read."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sarfile_analyzer_ng_spark.sources.sar_text import read_sar

from .test_sar_source import SAR_24H

N_FILES = 40


@pytest.fixture(scope="module")
def many_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("sar_many")
    for i in range(N_FILES):
        content = SAR_24H.replace("host1", f"host{i:03d}")
        (d / f"sa_{i:03d}.txt").write_text(content)
    return str(d)


def test_one_task_per_file(spark, many_files):
    df = read_sar(spark, many_files)
    # the repartition("file") stage gives each report its own task
    assert df.rdd.getNumPartitions() >= min(N_FILES, 4)
    per_file = df.groupBy("file").count().collect()
    assert len(per_file) == N_FILES
    counts = {r["count"] for r in per_file}
    assert len(counts) == 1  # identical reports → identical row counts


def test_multi_file_equals_single_file(spark, many_files, tmp_path):
    single = tmp_path / "one"
    single.mkdir()
    (single / "sa_007.txt").write_text(SAR_24H.replace("host1", "host007"))
    alone = read_sar(spark, str(single))
    among = read_sar(spark, many_files).where(F.col("host") == "host007")
    a = sorted(
        (r["section"], str(r["ts"]), r["device"], r["metric"], r["value"])
        for r in alone.collect()
    )
    b = sorted(
        (r["section"], str(r["ts"]), r["device"], r["metric"], r["value"])
        for r in among.collect()
    )
    assert a == b
