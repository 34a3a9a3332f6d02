"""The driver contract: entry() returns rows, every queries() key has a
callable, oracle keys are a subset, and results carry stable schemas."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "sum_qty" in df.columns


def test_registry_shape(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) <= set(qs)
    # rows-only ops are the documented exceptions; each has a strong
    # cross-check elsewhere (q51/q52 recall gates, q53/q77 LSH parity,
    # q54 sketch bounds, the exact reference-BPE parity pytest) so
    # their semantics are still pinned
    rows_only = set(qs) - set(oracles)
    assert rows_only == {"q31_dedup_minhash", "q32_dedup_simhash",
                         "q36_ann_lsh", "q50_sketch_stats",
                         "q90_bpe_merges"}
