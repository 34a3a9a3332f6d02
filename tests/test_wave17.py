"""Round-11 wave-5: ST32 — the streaming head of the q201 crawl
funnel (URL screen + canonical-URL dedup + quality gate in one
readStream pipeline, per-stage counters via a foreachBatch sink)."""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from sarfile_analyzer_ng_spark.functions import web as W
from sarfile_analyzer_ng_spark.streaming import ops as SO

SF_DIR = "/root/testdata/sf0.001"


def test_crawl_screen_stream_matches_batch(spark, tmp_path):
    """ST32 batch parity: the surviving canonical-URL set equals the
    batch keep-first winners (the ST5 set contract), per-row policy
    and quality flags replay the q201 stage rules, and the
    foreachBatch counter sink sees the work spread over multiple
    micro-batches with duplicates crossing batch boundaries."""
    from sarfile_analyzer_ng_spark.queries import (
        BLOCKED_DOMAINS,
        FUN2_MAX_TOKENS,
        FUN2_MIN_DISTINCT_RATIO,
        FUN2_MIN_TOKENS,
        POLICY_ROBOTS_HEX,
        _funnel2_crawl,
        _policy_cols,
    )

    crawl = _funnel2_crawl(spark, SF_DIR).withColumn(
        "ts", F.timestamp_seconds(1_700_000_000 + F.pmod("doc_id", 1000)))
    src = str(tmp_path / "crawl_src")
    os.makedirs(src)
    pdf = crawl.toPandas().sort_values("doc_id").reset_index(drop=True)
    pdf["ts"] = pdf["ts"].dt.tz_localize("UTC")
    # chunk 0 = the original fetches, chunk 1 = re-fetches + mirrors:
    # every re-fetch duplicates a canon first seen in an earlier batch
    orig = pdf[pdf.doc_id < 2_000_000]
    rest = pdf[pdf.doc_id >= 2_000_000]
    for i, sl in enumerate([orig, rest]):
        path = f"{src}/chunk{i}.parquet"
        sl.to_parquet(path, index=False, coerce_timestamps="us",
                      allow_truncated_timestamps=True)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = SO.crawl_screen_stream(
        stream, "url", "text", "ts", "1 hour",
        blocked_domains=BLOCKED_DOMAINS, robots_hex=POLICY_ROBOTS_HEX,
        min_tokens=FUN2_MIN_TOKENS, max_tokens=FUN2_MAX_TOKENS,
        min_distinct_ratio=FUN2_MIN_DISTINCT_RATIO,
    )
    batches = []  # the per-stage counter sink

    def sink(bdf, _bid):
        rows = bdf.collect()
        if rows:
            batches.append({
                "survivors": len(rows),
                "policy_ok": sum(1 for r in rows if r.policy_ok),
                "quality_ok": sum(1 for r in rows
                                  if r.policy_ok and r.quality_ok),
                "canons": [r.canon_url for r in rows],
            })

    q = (out.writeStream.foreachBatch(sink)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    assert len(batches) >= 2  # dedup state really crossed batches

    # batch twin: q201's stage-1 keep-first winners + stage-2/5 rules
    host = W.url_host(F.col("url"))
    dom = W.registrable_domain(F.regexp_replace(host, r":[0-9]+$", ""))
    w1 = Window.partitionBy(W.canonical_url(F.col("url"))).orderBy("doc_id")
    status, _lic = _policy_cols(F.col("domain"))
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    from sarfile_analyzer_ng_spark.util import rnd

    dr = rnd(F.size(F.array_distinct(toks)) / F.size(toks).cast("double"), 6)
    winners = (
        crawl.withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") == 1)
        .withColumn("canon", W.canonical_url(F.col("url")))
        .withColumn("domain", dom)
        .withColumn("policy_ok", status == "allow")
        .withColumn(
            "quality_ok",
            (F.size(toks) >= FUN2_MIN_TOKENS)
            & (F.size(toks) <= FUN2_MAX_TOKENS)
            & (dr >= FUN2_MIN_DISTINCT_RATIO),
        )
    ).collect()
    got_canons = sorted(c for b in batches for c in b["canons"])
    assert got_canons == sorted(r.canon for r in winners)
    assert sum(b["policy_ok"] for b in batches) == \
        sum(1 for r in winners if r.policy_ok)
    assert sum(b["quality_ok"] for b in batches) == \
        sum(1 for r in winners if r.policy_ok and r.quality_ok)
    # the funnel really funnels: each stage strictly reduces mass
    n1 = len(got_canons)
    n2 = sum(b["policy_ok"] for b in batches)
    n5 = sum(b["quality_ok"] for b in batches)
    assert n1 > n2 > n5 > 0


def test_crawl_screen_stream_from_markup(spark, tmp_path):
    """ST32 html mode: starting the stream at MARKUP (stage 0 as a
    pure projection) must round-trip the text exactly — every
    survivor's extracted text equals the original crawl text of the
    document it kept (the q201 round-trip property, live)."""
    from sarfile_analyzer_ng_spark.queries import (
        BLOCKED_DOMAINS,
        POLICY_ROBOTS_HEX,
        _funnel2_crawl,
        _funnel2_page_expr,
    )

    crawl = (
        _funnel2_crawl(spark, SF_DIR)
        .withColumn("ts", F.timestamp_seconds(
            1_700_000_000 + F.pmod("doc_id", 1000)))
        .withColumn("html", _funnel2_page_expr())
    )
    src = str(tmp_path / "crawl_html_src")
    os.makedirs(src)
    pdf = crawl.drop("text").toPandas().sort_values(
        "doc_id").reset_index(drop=True)
    pdf["ts"] = pdf["ts"].dt.tz_localize("UTC")
    pdf.to_parquet(f"{src}/chunk0.parquet", index=False,
                   coerce_timestamps="us", allow_truncated_timestamps=True)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = SO.crawl_screen_stream(
        stream, "url", "text", "ts", "1 hour",
        blocked_domains=BLOCKED_DOMAINS, robots_hex=POLICY_ROBOTS_HEX,
        html_col="html",
    )
    q = (out.writeStream.format("memory").queryName("st32_html")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = spark.table("st32_html").select(
        "doc_id", "text", "policy_ok", "quality_ok").collect()
    assert len(got) > 0
    # round-trip: extracted text == the original crawl text per doc
    orig = {r.doc_id: r.text for r in
            crawl.select("doc_id", "text").collect()}
    assert all(orig[r.doc_id] == r.text for r in got)
    # the policy flag really varies (blocked + robots domains exist)
    assert {r.policy_ok for r in got} == {True, False}
