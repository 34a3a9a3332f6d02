"""File-management catalog: the upload → query → usage-report →
delete → cleanup lifecycle (reference api/services.py:94/:159/:379/:524)."""

from __future__ import annotations

import lzma
import os
import time

import pytest
from pyspark.sql import functions as F

from sarfile_analyzer_ng_spark.store import SarStore, StoreError

from .test_sar_source import SAR_24H, SAR_AMPM


@pytest.fixture()
def store(spark, tmp_path):
    return SarStore(spark, str(tmp_path / "store"))


def test_upload_query_delete_cycle(store):
    info = store.upload("alice", "upload.txt", SAR_24H.encode())
    assert info["rows"] > 0 and info["headers"] >= 2
    name = info["name"]
    assert name.startswith("host1_")  # renamed to host_date

    df = store.load("alice", name)
    assert df.where(F.col("metric") == "%user").count() > 0
    # the file column reflects the stored (renamed) name
    assert df.select("file").distinct().first()["file"] == name

    store.delete("alice", name)
    with pytest.raises(StoreError):
        store.load("alice", name)
    with pytest.raises(StoreError):
        store.delete("alice", name)  # double delete reports not-found


def test_upload_xz_and_overwrite_warns(store):
    blob = lzma.compress(SAR_AMPM.encode())
    info1 = store.upload("bob", "report.txt.xz", blob)
    assert any("xz archive unpacked" in w for w in info1["warnings"])
    info2 = store.upload("bob", "report.txt.xz", blob)
    assert info2["name"] == info1["name"]
    assert any("overwritten" in w for w in info2["warnings"])


def test_upload_rejects_binary_and_bad_names(store):
    with pytest.raises(StoreError, match="binary SAR"):
        store.upload("alice", "sa20", bytes([0x93, 0x21, 0x00, 0xFF]) * 16)
    with pytest.raises(StoreError, match="invalid"):
        store.upload("../evil", "f.txt", SAR_24H.encode())
    with pytest.raises(StoreError, match="invalid"):
        store.upload("alice", "../../etc/passwd", SAR_24H.encode())


def test_disk_usage_report(store):
    store.upload("alice", "a.txt", SAR_24H.encode())
    store.upload("bob", "b.txt", SAR_AMPM.encode())
    usage = {r["user"]: r for r in store.disk_usage_report().collect()}
    assert set(usage) == {"alice", "bob"}
    assert usage["alice"]["file_count"] == 1
    assert usage["alice"]["total_bytes"] > 0
    assert usage["alice"]["sar_bytes"] == len(SAR_24H.encode())


def test_cleanup_old_files_dry_run_then_delete(store):
    info = store.upload("alice", "a.txt", SAR_24H.encode())
    # age the parquet artificially: set every data file's mtime 40
    # days back (age = newest data-file mtime)
    pq = store.root / "alice" / f"{info['name']}.parquet"
    old = time.time() - 40 * 86400
    for f in [pq, *pq.rglob("*")]:
        os.utime(f, (old, old))

    dry = store.cleanup_old_files(days=30, dry_run=True)
    assert dry["deleted_files"] == 1 and dry["dry_run"]
    assert store.list_files("alice").count() == 1  # nothing touched

    real = store.cleanup_old_files(days=30, dry_run=False)
    assert real["deleted_files"] == 1
    assert store.list_files("alice").count() == 0
    # fresh files survive a cleanup
    store.upload("alice", "a.txt", SAR_24H.encode())
    assert store.cleanup_old_files(days=30, dry_run=False)["deleted_files"] == 0
    assert store.list_files("alice").count() == 1


def test_list_files_is_distributed_not_walk(store, monkeypatch):
    """The primary listing path must be the Spark file index — the
    driver-side walk is only the fallback for unlistable roots."""
    store.upload("alice", "a.txt", SAR_24H.encode())

    def boom(*a, **k):
        raise AssertionError("fell back to the driver-side walk")

    monkeypatch.setattr(store, "_list_files_walk", boom)
    rows = store.list_files().collect()
    assert [r["user"] for r in rows] == ["alice"]
    assert rows[0]["parquet_bytes"] > 0 and rows[0]["age_days"] < 1.0
