"""Round-9 wave-6 operators: BM25-vs-QL ranker agreement (q180),
k-anonymity audit (q181), Benford first-digit audit (q182), and the
`leakage` CLI command."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_ranker_agreement_bounds_and_self_consistency(spark):
    from sarfile_analyzer_ng_spark.queries import q180_ranker_agreement

    rows = q180_ranker_agreement(spark, SF_DIR).collect()
    assert rows  # one row per eval query
    for r in rows:
        assert 0 <= r.n_common <= r.n_bm
        assert r.overlap == pytest.approx(r.n_common / r.n_bm, abs=1e-4)
        assert r.top1_match in (0, 1)
        # identical top-1 implies at least one common doc
        if r.top1_match == 1:
            assert r.n_common >= 1


def test_k_anonymity_hand_case(spark):
    from sarfile_analyzer_ng_spark.queries import KANON_K

    assert KANON_K == 5
    # group (en, s1, bin4): 6 docs of 16 chars -> safe;
    # group (fr, s1, bin2): 1 doc of 4 chars -> at risk
    rows = (
        [(i, "x" * 16, "en", "s1") for i in range(6)]
        + [(99, "x" * 4, "fr", "s1")]
    )
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    n = F.length(F.coalesce(F.col("text"), F.lit(""))).cast("double")
    from sarfile_analyzer_ng_spark.util import rnd

    lb = F.when(n <= 0, F.lit(-1)).otherwise(
        F.floor(rnd(F.log2(n), 8)).cast("int")
    )
    g = df.groupBy("lang", "source", lb.alias("b")).agg(
        F.count(F.lit(1)).alias("sz")
    )
    sizes = {(r.lang, r.b): r.sz for r in g.collect()}
    assert sizes[("en", 4)] == 6 and sizes[("fr", 2)] == 1


def test_k_anonymity_on_gate_corpus(spark):
    from sarfile_analyzer_ng_spark.queries import q181_k_anonymity

    rows = {r.source: r for r in q181_k_anonymity(spark, SF_DIR).collect()}
    assert len(rows) == 20
    for r in rows.values():
        assert r.n_small_groups <= r.n_groups
        assert r.n_docs_at_risk < 5 * r.n_small_groups + 1
        assert r.min_group >= 1


def test_benford_shares_sum_to_one_and_flag_uniform(spark):
    from sarfile_analyzer_ng_spark.queries import (
        BENFORD_EXP,
        q182_benford_audit,
    )

    assert sum(BENFORD_EXP) == pytest.approx(1.0, abs=1e-6)
    out = q182_benford_audit(spark, SF_DIR).collect()
    by_et = {}
    for r in out:
        by_et.setdefault(r.event_type, []).append(r)
    for et, rows in by_et.items():
        assert sum(r.obs_share for r in rows) == pytest.approx(1.0,
                                                               abs=1e-3)
        assert all(1 <= r.digit <= 9 for r in rows)
        assert all(r.chi2_term >= 0 for r in rows)
    # synthetic uniform-ish values are NOT Benford: the chi2 total
    # should be clearly nonzero for at least one type
    tot = {et: sum(r.chi2_term for r in rows) for et, rows in by_et.items()}
    assert max(tot.values()) > 1.0


def test_leakage_cli_runs(spark, capsys, tmp_path, monkeypatch):
    import pandas as pd

    from sarfile_analyzer_ng_spark.__main__ import main

    pdf = pd.DataFrame(
        {
            "doc_id": pd.array(range(40), dtype="int64"),
            "text": [f"doc {i}" for i in range(40)],
        }
    )
    import os

    path = str(tmp_path / "docs")
    os.makedirs(path)
    pdf.to_parquet(f"{path}/part0.parquet", index=False)
    # reuse the session fixture instead of building a new JVM
    import sarfile_analyzer_ng_spark.session as sess

    monkeypatch.setattr(sess, "get_spark", lambda *a, **k: spark)
    main(["leakage", path, "--json"])
    outlines = [
        ln for ln in capsys.readouterr().out.strip().splitlines() if ln
    ]
    import json

    rows = [json.loads(ln) for ln in outlines]
    assert {r["pair"] for r in rows} == {"train-val", "train-test",
                                         "val-test"}
    assert all(r["n_groups"] == 0 for r in rows)
