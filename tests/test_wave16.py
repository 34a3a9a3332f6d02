"""Round-11 wave-4: robots/license policy gating (q205) and the
generalized q201 stage-2 policy gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from sarfile_analyzer_ng_spark.queries import (
    BLOCKED_DOMAINS,
    POLICY_DEFAULT_LICENSE,
    domain_policy,
    q201_curation_funnel_v2,
    q205_license_rollup,
)

SF_DIR = "/root/testdata/sf0.001"


def test_policy_table_rules(spark):
    doms = spark.createDataFrame(
        [(d,) for d in BLOCKED_DOMAINS]
        + [("example.org",), ("example.net",), ("example.co.uk",),
           ("example.com",), ("example.com",)],  # dup collapses
        "domain string")
    got = {r.domain: r for r in domain_policy(doms).collect()}
    assert len(got) == len(BLOCKED_DOMAINS) + 4  # distinct domains
    for d in BLOCKED_DOMAINS:
        assert got[d].status == "block"  # blocklist beats robots
    assert got["example.org"].license == "cc-by"
    assert got["example.net"].license == "research-only"
    assert got["example.co.uk"].license == "all-rights-reserved"
    assert got["example.com"].license == POLICY_DEFAULT_LICENSE
    for r in got.values():
        assert r.status in ("block", "robots-disallow", "allow")


def test_q205_rollup_partitions_corpus(spark):
    from sarfile_analyzer_ng_spark.queries import _t

    n_docs = _t(spark, SF_DIR, "documents").count()
    out = q205_license_rollup(spark, SF_DIR)
    agg = out.agg(F.sum("n_docs").alias("d"),
                  F.sum("n_domains").alias("dom")).collect()[0]
    assert agg.d == n_docs  # every doc lands in exactly one cell
    rows = out.collect()
    assert all(r.n_tokens > 0 for r in rows)
    statuses = {r.status for r in rows}
    assert "block" in statuses and "allow" in statuses


def test_q205_plan_broadcasts_policy(spark):
    plan = q205_license_rollup(spark, SF_DIR)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # policy side ships, no shuffle join
    assert "SortMergeJoin" not in plan


def test_q201_policy_gate_supersedes_blocklist(spark):
    rows = {r.stage_no: r for r in
            q201_curation_funnel_v2(spark, SF_DIR).collect()}
    s2 = rows[2]
    assert s2.stage == "domain_policy_gate"
    # the policy gate drops at least the blocklisted mass and also the
    # robots-disallowed slice, but never everything
    assert 0 < s2.n_dropped < s2.n_in
    assert rows[5].n_kept > 0
