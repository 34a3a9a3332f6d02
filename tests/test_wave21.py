"""Round-12 wave-3: robots longest-match rules (q213), line-level
dedup (q214), WARC headers (q215), mojibake audit (q216), frontier
priority (q217)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_q213_longest_match_semantics(spark):
    from sarfile_analyzer_ng_spark.queries import q213_robots_rules

    out = q213_robots_rules(spark, SF_DIR)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    rows = out.collect()
    # the synthesis correlates domain and path class (doc_id%5 is a
    # function of doc_id%20), so each domain serves ONE path family:
    # /p-class domains are fully blocked by the universal rule,
    # /docs-class domains block only on the md5-half, the rest are
    # untouched — all three outcomes must be present
    assert any(r.n_blocked == r.n_urls for r in rows)       # /p class
    assert any(0 < r.n_blocked < r.n_urls for r in rows)    # /docs half
    assert any(r.n_blocked == 0 for r in rows)              # untouched
    # the allow-override fires only on the md5-half domains that
    # disallow /docs: ids starting with '1' under /docs survive
    assert any(r.n_override > 0 for r in rows)
    # overrides only exist where /docs is disallowed — on the other
    # half no disallow matches /docs paths, so no override either
    half = {r.domain for r in rows
            if r.n_override > 0}
    import hashlib
    for d in half:
        assert hashlib.md5(d.encode()).hexdigest()[0] in "01234567", d


def test_line_dedup_hand_cases(spark):
    from sarfile_analyzer_ng_spark.functions.dedup import line_dedup

    rows = [
        (1, "alpha\nbeta\ngamma"),
        (2, "beta\ndelta"),          # beta cut (doc1 saw it first)
        (3, "  \n\ndelta\nepsilon"), # blank lines drop; delta cut
        (4, "zeta\nzeta"),           # same NEW line twice in one
                                     # doc: first kept, second cut
        (5, "alpha\nalpha"),         # both occurrences cut — doc1
                                     # holds the global first
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc: r for r in line_dedup(df, "text", "doc_id").collect()}
    assert got[1].n_lines == 3 and got[1].n_cut == 0
    assert got[1].clean_text == "alpha\nbeta\ngamma"
    assert got[2].n_lines == 2 and got[2].n_cut == 1
    assert got[2].clean_text == "delta"
    assert got[3].n_lines == 2 and got[3].n_cut == 1
    assert got[3].clean_text == "epsilon"
    assert got[4].n_lines == 2 and got[4].n_cut == 1
    assert got[4].clean_text == "zeta"
    assert got[5].n_lines == 2 and got[5].n_cut == 2
    assert got[5].clean_text == ""


def test_q214_template_lines_cut_once(spark):
    from sarfile_analyzer_ng_spark.queries import q214_line_dedup, _t

    out = q214_line_dedup(spark, SF_DIR)
    n_docs = _t(spark, SF_DIR, "documents").count()
    agg = out.agg(F.sum("n_cut").alias("c"),
                  F.count(F.lit(1)).alias("n")).collect()[0]
    assert agg.n == n_docs
    # footer on every 2nd doc, promo on every 3rd — each template
    # line survives exactly ONCE corpus-wide
    footer_docs = sum(1 for i in range(n_docs) if i % 2 == 0)
    promo_docs = sum(1 for i in range(n_docs) if i % 3 == 0)
    expected_template_cuts = (footer_docs - 1) + (promo_docs - 1)
    # plus any duplicate-text docs' body/ref collisions; at least
    # the template mass must be cut
    assert agg.c >= expected_template_cuts


def test_q215_header_parse_totals(spark):
    from sarfile_analyzer_ng_spark.queries import q215_warc_headers, _t

    out = q215_warc_headers(spark, SF_DIR)
    rows = out.collect()
    n_docs = _t(spark, SF_DIR, "documents").count()
    assert sum(r.n_records for r in rows) == n_docs
    assert {r.warc_type for r in rows} == {"request", "response"}
    assert all(r.total_bytes > 0 for r in rows)
    assert all(1 <= r.n_days <= 9 for r in rows)


def test_q216_mojibake_plant_counts(spark):
    from sarfile_analyzer_ng_spark.queries import q216_mojibake_audit, _t

    out = q216_mojibake_audit(spark, SF_DIR)
    docs = _t(spark, SF_DIR, "documents")
    want = docs.where(F.col("doc_id") % 13 == 0).count()
    agg = out.agg(F.sum("n_affected").alias("a"),
                  F.sum("n_markers").alias("m")).collect()[0]
    assert agg.a == want
    # the plant carries exactly 3 marker hits (Ã, â€, Â)
    assert agg.m == 3 * want


def test_q217_frontier_ranking(spark):
    from sarfile_analyzer_ng_spark.queries import (
        FRONTIER_TOP, _policy_cols, q217_frontier_priority)

    out = q217_frontier_priority(spark, SF_DIR)
    rows = sorted(out.collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, FRONTIER_TOP + 1))
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    # policy gate: no blocked/robots domain appears
    df = out.sparkSession.createDataFrame(
        [(r.domain,) for r in rows], "domain string")
    st, _ = _policy_cols(F.col("domain"))
    assert df.select(st.alias("s")).where(F.col("s") != "allow").count() == 0
    # trap discount is live: at least one ranked domain carries a
    # nonzero trap_rate strictly below 1
    assert any(0 < r.trap_rate < 1 for r in rows)


def test_raw_doc_ids_below_plant_offset(spark):
    """q121's signature reuse shifts planted-twin keys by
    +2*PLANT_OFFSET and splits sides with doc < PLANT_OFFSET — both
    silently assume every raw doc_id sits below the offset (r12
    ADVICE: assert it, at every SF the suite sees)."""
    from sarfile_analyzer_ng_spark.queries import PLANT_OFFSET, _t

    for sf in ("sf0.001", "sf0.01"):
        docs = _t(spark, f"/root/testdata/{sf}", "documents")
        top = docs.agg(F.max("doc_id").alias("m")).collect()[0].m
        assert top < PLANT_OFFSET, f"{sf}: max doc_id {top}"
