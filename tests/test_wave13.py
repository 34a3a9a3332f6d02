"""Round-11 wave-1: ADVICE parity/metric fixes — kcenter oracle-twin
pool exclusion (duplicates / k>n), passage-containment distinct
denominator, sketch summary-size guards."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from sarfile_analyzer_ng_spark.functions import similarity as S

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------------------------ #
# kcenter impl/oracle parity on degenerate inputs (ADVICE r10 medium)
# ------------------------------------------------------------------ #

def _kcenter_duckdb(rows: list[tuple[int, list[float]]], k: int):
    from sarfile_analyzer_ng_spark.queries import _sql_kcenter

    con = duckdb.connect()
    con.register("embeddings", pd.DataFrame(
        {"vec_id": [r[0] for r in rows],
         "embedding": [r[1] for r in rows]}))
    got = con.execute(_sql_kcenter(k)).fetchall()
    return sorted((int(r[0]), int(r[1]),
                   None if r[2] is None else round(float(r[2]), 6))
                  for r in got)


def _kcenter_spark(spark, rows, k: int):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = S.kcenter_select(df, "vec_id", "embedding", k=k).collect()
    return sorted((int(r.sel_round), int(r.vec_id),
                   None if r.d2 is None else round(float(r.d2), 6))
                  for r in got)


def test_kcenter_sql_parity_duplicates(spark):
    """Three identical max-norm points: after round 2 every remaining
    dmin is 0 — without the d{r} pool exclusion the oracle could
    re-pick a center while Spark moves on. Both engines must emit the
    same trace."""
    rows = [(1, [3.0, 0.0]), (2, [3.0, 0.0]), (3, [3.0, 0.0]),
            (4, [0.0, 1.0]), (5, [-2.0, 0.0])]
    k = 5
    sp = _kcenter_spark(spark, rows, k)
    du = _kcenter_duckdb(rows, k)
    assert sp == du
    assert len(sp) == k  # 5 distinct ids exist, trace must reach k
    assert len({v for _, v, _ in sp}) == k  # no center picked twice


def test_kcenter_sql_parity_k_exceeds_n(spark):
    """k > n: Spark breaks when the pool is exhausted; the oracle's
    empty-CTE chain must yield the same short trace."""
    rows = [(1, [1.0, 0.0]), (2, [0.0, 2.0]), (3, [0.0, 2.0])]
    k = 6
    sp = _kcenter_spark(spark, rows, k)
    du = _kcenter_duckdb(rows, k)
    assert sp == du
    assert len(sp) == 3


def test_kcenter_sql_parity_all_identical(spark):
    """Fully degenerate corpus (every vector identical): both engines
    must still pick distinct ids in identical tie-break order."""
    rows = [(i, [1.0, 1.0]) for i in range(1, 5)]
    sp = _kcenter_spark(spark, rows, 4)
    du = _kcenter_duckdb(rows, 4)
    assert sp == du
    assert [v for _, v, _ in sp] == [1, 2, 3, 4]  # id-ASC tie-break


# ------------------------------------------------------------------ #
# containment denominator = distinct surviving hashes (ADVICE r10)
# ------------------------------------------------------------------ #

def _mkdoc(words: list[str]) -> str:
    return " ".join(words)


def test_containment_identical_docs_with_repeats_score_one(spark):
    from sarfile_analyzer_ng_spark.functions import dedup as D

    # passage_words=2 → passages are word pairs; "a b" repeats inside
    # each doc. Identical docs MUST score exactly 1.0.
    t = _mkdoc(["a", "b", "c", "d", "a", "b", "e", "f"])
    df = spark.createDataFrame([(1, t), (2, t)], "doc_id long, text string")
    rows = D.passage_containment_pairs(
        df, "text", "doc_id", passage_words=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.containment == 1.0
    assert r.n_pass_a == r.n_pass_b == 3  # distinct hashes, not 4 raw


def test_containment_hot_capped_passage_excluded_from_denominator(spark):
    from sarfile_analyzer_ng_spark.functions import dedup as D

    # "z z" appears in EVERY doc → df=4 > max_df=3 → capped. The two
    # identical docs must still score 1.0 because the denominator
    # counts only SURVIVING hashes.
    base = ["p", "q", "r", "s", "z", "z"]
    rows_in = [
        (1, _mkdoc(base)),
        (2, _mkdoc(base)),
        (3, _mkdoc(["m", "n", "z", "z"])),
        (4, _mkdoc(["u", "v", "z", "z"])),
    ]
    df = spark.createDataFrame(rows_in, "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): r for r in D.passage_containment_pairs(
        df, "text", "doc_id", passage_words=2, max_df=3).collect()}
    assert got[(1, 2)].containment == 1.0
    assert got[(1, 2)].n_pass_a == 2  # "p q" + "r s"; "z z" capped out
    assert (3, 4) not in got  # only shared passage was capped


# ------------------------------------------------------------------ #
# scheme-preserving re-fetch plants (ADVICE r10): EVERY re-fetch must
# collapse with its original, http-scheme docs included
# ------------------------------------------------------------------ #

def test_refetch_plants_fully_collapse(spark):
    from pyspark.sql import functions as F

    from sarfile_analyzer_ng_spark.functions import web as W
    from sarfile_analyzer_ng_spark.queries import (
        _refetch_url_expr, _synth_url_expr, _t, q202_url_frontier)

    docs = _t(spark, SF_DIR, "documents").select("doc_id", "source")
    # row-wise: canonical(refetch(url)) == canonical(url) for EVERY
    # doc — including the http-scheme third that the old HTTPS://
    # hardcode broke (scheme mismatch; :443 port surviving on http)
    orig = docs.withColumn("url", _synth_url_expr()).select(
        "doc_id", W.canonical_url(F.col("url")).alias("canon"))
    ref = docs.withColumn(
        "url", _refetch_url_expr(_synth_url_expr(), "x")
    ).select("doc_id", W.canonical_url(F.col("url")).alias("rcanon"))
    bad = orig.join(ref, "doc_id").where(F.col("canon") != F.col("rcanon"))
    assert bad.count() == 0
    # q202: every re-offer is now KNOWN; only the /v2/ variants are
    # novel (their paths exist nowhere in the synth corpus)
    n_fresh = docs.where(F.col("doc_id") % 5 != 0).count()
    tot = q202_url_frontier(spark, SF_DIR).agg(
        F.sum("n_batch").alias("b"), F.sum("n_novel").alias("n")
    ).collect()[0]
    assert tot.n == n_fresh
    assert tot.b - tot.n == docs.count() - n_fresh


# ------------------------------------------------------------------ #
# sketch summary-size guards fail loudly (ADVICE r10)
# ------------------------------------------------------------------ #

def test_sketch_guards_reject_unmergeable_sizes(spark):
    from sarfile_analyzer_ng_spark.operators import sketches as SK

    df = spark.createDataFrame([(1, 1.0)], "i long, v double")
    with pytest.raises(ValueError, match="mg_topk"):
        SK.mg_topk(df, "i", k=200_000, shards=8)
    with pytest.raises(ValueError, match="rank-sample"):
        SK.rank_sample_quantiles(df, "v", "i", m=300_000, shards=4)
