"""Round-11 wave-6: extraction-quality audit (q206) and
frequency-based boilerplate-block discovery (q207)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_q206_counts_empty_extractions(spark):
    from sarfile_analyzer_ng_spark.queries import (
        EXA_CHROME_MOD, _t, q206_extraction_audit)

    docs = _t(spark, SF_DIR, "documents")
    expected_empty = docs.where(
        F.col("doc_id") % EXA_CHROME_MOD == 0).count()
    out = q206_extraction_audit(spark, SF_DIR)
    agg = out.agg(F.sum("n_empty").alias("e"),
                  F.sum("n_pages").alias("p")).collect()[0]
    assert agg.e == expected_empty  # exactly the chrome-only plant
    assert agg.p == docs.count()
    rows = out.collect()
    # chrome is link-dense: every source sees a high boilerplate rate
    assert all(r.boiler_rate > 0.4 for r in rows)
    assert all(r.mean_chars > 0 for r in rows)


def test_q207_frequency_rule_catches_linkfree_template(spark):
    """The planted rating DIV recurs on 1/5 of pages and carries no
    anchors — invisible to the link-density rule, caught by the
    document-frequency rule. On every page n_freq == n_link + 1
    (nav/footer/promo are both link-dense AND frequent; the DIV is
    frequent only), and exactly the h1 + document text survive."""
    from sarfile_analyzer_ng_spark.queries import q207_boilerplate_blocks

    rows = q207_boilerplate_blocks(spark, SF_DIR).collect()
    assert len(rows) == 500
    for r in rows:
        assert r.n_freq == r.n_link + 1
        assert r.n_kept == 2  # h1 (df 5%) + the unique document text
        assert r.kept_chars > 0
        assert r.n_blocks in (5, 6)  # promo on every 3rd page


def test_q207_plan_shape(spark):
    from sarfile_analyzer_ng_spark.queries import q207_boilerplate_blocks

    plan = q207_boilerplate_blocks(spark, SF_DIR)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan  # no python UDF anywhere
    # the page-count scalar rides a broadcast, never a shuffle join
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
