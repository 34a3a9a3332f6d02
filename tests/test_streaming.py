"""Streaming operators must agree with their batch twins on the same
(finite) data — driven through a real file-source stream into a memory
sink."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from sarfile_analyzer_ng_spark.catalog import load_table
from sarfile_analyzer_ng_spark.streaming import ops as SO
from sarfile_analyzer_ng_spark.util import rnd

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """events as a plain-timestamp parquet dir (streaming source needs
    a directory and a Spark-readable schema, not TIMESTAMP(NANOS))."""
    spark_dir = str(tmp_path_factory.mktemp("events_stream"))
    return spark_dir


def _materialize(spark, path):
    ev = load_table(spark, SF_DIR, "events")
    ev.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path).schema


def test_windowed_agg_matches_batch_resample(spark, events_dir):
    schema = _materialize(spark, events_dir)
    stream = SO.stream_events(spark, events_dir, schema)
    assert stream.isStreaming
    out = SO.windowed_agg(
        stream, "ts", "1 hour", "2 hours", ["event_type"],
        [F.count(F.lit(1)).alias("cnt"), rnd(F.avg("value"), 4).alias("avg_value")],
    )
    got = SO.run_batch_equivalent(out, "win_agg_test", spark)

    batch = (
        spark.read.parquet(events_dir)
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("cnt"), rnd(F.avg("value"), 4).alias("avg_value"))
    )
    g = {(str(r["bucket"]), r["event_type"]): (r["cnt"], r["avg_value"])
         for r in got.collect()}
    b = {(str(r["bucket"]), r["event_type"]): (r["cnt"], r["avg_value"])
         for r in batch.collect()}
    assert g == b


def test_sessionize_stream_counts(spark, events_dir):
    schema = _materialize(spark, events_dir)
    stream = SO.stream_events(spark, events_dir, schema)
    out = SO.sessionize_stream(stream, "ts", "user_id", 3600, "2 hours")
    got = SO.run_batch_equivalent(out, "sess_test", spark)
    # batch twin: total sessions per user via the batch sessionizer
    from sarfile_analyzer_ng_spark.operators.timeseries import sessionize

    batch = (
        sessionize(spark.read.parquet(events_dir), "ts", ["user_id"], 3600)
        .groupBy("user_id")
        .agg(F.countDistinct("session_id").alias("n_sessions"),
             F.count(F.lit(1)).alias("n_events"))
    )
    g_sessions = got.groupBy("user_id").count().collect()
    g = {r["user_id"]: r["count"] for r in g_sessions}
    b = {r["user_id"]: r["n_sessions"] for r in batch.collect()}
    assert g == b
    # event totals must be preserved too
    g_events = {r["user_id"]: r["total"] for r in
                got.groupBy("user_id").agg(F.sum("n_events").alias("total")).collect()}
    b_events = {r["user_id"]: r["n_events"] for r in batch.collect()}
    assert g_events == b_events


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Stop a windowed-agg stream between batches, resume from the same
    checkpoint with new data, and resume once more with NO new data:
    output must equal the batch computation over closed windows, with
    no duplicates from recovery replay."""
    import datetime

    ev = load_table(spark, SF_DIR, "events").select("ts", "event_type", "value")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut = lo + (hi - lo) / 2

    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    ev.where(F.col("ts") <= cut).write.mode("append").parquet(in_dir)
    schema = spark.read.parquet(in_dir).schema

    def drain():
        stream = SO.stream_events(spark, in_dir, schema)
        agg = SO.windowed_agg(
            stream, "ts", "1 hour", "1 second", ["event_type"],
            [F.count(F.lit(1)).alias("cnt")],
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    drain()                                   # phase 1: first half
    n_phase1 = spark.read.parquet(out_dir).count()
    ev.where(F.col("ts") > cut).write.mode("append").parquet(in_dir)
    drain()                                   # phase 2: resume + rest
    drain()                                   # phase 3: recovery, no new data

    got = {(str(r["bucket"]), r["event_type"]): r["cnt"]
           for r in spark.read.parquet(out_dir).collect()}
    assert len(got) == spark.read.parquet(out_dir).count()  # no duplicate rows
    assert n_phase1 < len(got)  # phase 1 emitted some but not all windows

    # batch twin over CLOSED windows (watermark = max ts - 1s)
    watermark = hi - datetime.timedelta(seconds=1)
    batch = (
        spark.read.parquet(in_dir)
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("bucket") + F.expr("INTERVAL 1 HOUR") <= F.lit(watermark))
    )
    expected = {(str(r["bucket"]), r["event_type"]): r["cnt"]
                for r in batch.collect()}
    assert got == expected


def test_rate_stream_matches_batch_delta_rate(spark, tmp_path):
    """ST4: applyInPandasWithState counter->rate must equal the batch
    lag-window operator row-for-row, with state carrying last (ts,
    value) across micro-batch boundaries (one file per trigger)."""
    import os

    from sarfile_analyzer_ng_spark.operators import timeseries as TS

    src = str(tmp_path / "rate_src")
    os.makedirs(src)
    ev = (
        load_table(spark, SF_DIR, "events")
        # one row per (series, ts): lag over duplicate timestamps has
        # no deterministic order, so parity needs unique keys
        .groupBy(F.col("event_type").alias("series"), "ts")
        .agg(F.max("value").alias("value"))
    )
    pdf = ev.toPandas().sort_values("ts").reset_index(drop=True)
    pdf["ts"] = pdf["ts"].dt.tz_localize("UTC")  # parquet TIMESTAMP, not NTZ
    n = len(pdf)
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        path = f"{src}/chunk{i}.parquet"
        pdf.iloc[cuts[i]:cuts[i + 1]].to_parquet(
            path, index=False, coerce_timestamps="us",
            allow_truncated_timestamps=True)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    out = SO.rate_stream(stream, "ts", "series", "value")
    q = (
        out.writeStream.format("memory")
        .queryName("rate_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("rate_stream_test")
    assert q.lastProgress is not None  # stream actually ran

    batch = TS.delta_rate(
        spark.read.parquet(src), "ts", "value", ["series"]
    ).select("series", "ts", "value", "rate")
    g = {(r["series"], str(r["ts"])): (r["value"], r["rate"]) for r in got.collect()}
    b = {(r["series"], str(r["ts"])): (r["value"], r["rate"]) for r in batch.collect()}
    assert len(g) == len(b) > 0
    assert g == b
    # state really carried across batches: at most one null rate per
    # series (the true first sample), not one per micro-batch
    nulls = got.where(F.col("rate").isNull()).groupBy("series").count().collect()
    assert all(r["count"] == 1 for r in nulls)


def test_dedup_stream_matches_batch_digest_set(spark, tmp_path):
    """ST5: streaming content-hash dedup must keep exactly the batch
    operator's surviving digest set, with duplicates planted across
    micro-batch boundaries (state must carry between batches)."""
    import os

    from sarfile_analyzer_ng_spark.functions import dedup as D

    src = str(tmp_path / "dedup_src")
    os.makedirs(src)
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .withColumn("ts", F.timestamp_seconds(1_700_000_000 + F.col("doc_id")))
    )
    twins = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text",
        (F.col("ts") + F.expr("INTERVAL 10 SECONDS")).alias("ts"),
    )
    full = docs.unionByName(twins)
    pdf = full.toPandas().sort_values("doc_id").reset_index(drop=True)
    pdf["ts"] = pdf["ts"].dt.tz_localize("UTC")
    n = len(pdf)
    # chunk 0 = originals, chunk 1 = twins: every twin is a duplicate
    # of a digest first seen in an earlier micro-batch
    for i, sl in enumerate([pdf.iloc[: n // 2], pdf.iloc[n // 2:]]):
        path = f"{src}/chunk{i}.parquet"
        sl.to_parquet(path, index=False, coerce_timestamps="us",
                      allow_truncated_timestamps=True)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = SO.dedup_stream(stream, "text", "ts", "1 hour")
    q = (
        out.writeStream.format("memory").queryName("dedup_stream_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_stream_test")

    batch = D.exact_dedup(spark.read.parquet(src), "text", "doc_id")
    g = {r["d"] for r in got.select(F.md5("text").alias("d")).collect()}
    b = {r["d"] for r in batch.select(F.md5("text").alias("d")).collect()}
    assert got.count() == batch.count() == len(b)
    assert g == b
    # twins really were dropped: every survivor is an original
    assert got.where(F.col("doc_id") >= 1_000_000).count() == 0


def test_quality_gate_stream_matches_batch_filter(spark, tmp_path):
    """ST6: the stateless quality gate must pass exactly the documents
    the batch map-stage rules pass — operator reuse on a stream, no
    state, no watermark."""
    import os

    from sarfile_analyzer_ng_spark.functions.text import lang_id, quality_score

    src = str(tmp_path / "docs_src")
    os.makedirs(src)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    docs.toPandas().to_parquet(f"{src}/docs.parquet", index=False)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.format("parquet").schema(schema).load(src)
    out = SO.quality_gate_stream(stream, "text")
    q = (
        out.writeStream.format("memory").queryName("quality_gate_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"] for r in
           spark.table("quality_gate_test").select("doc_id").collect()}

    batch = lang_id(quality_score(spark.read.parquet(src), "text"), "text")
    want = {
        r["doc_id"]
        for r in batch.where(
            (F.col("n_words") >= 20)
            & (F.col("punct_ratio") <= 0.3)
            & F.col("pred_lang").isin(["en", "de", "es", "fr"])
        ).select("doc_id").collect()
    }
    assert got == want and 0 < len(got) < 500


def test_chunking_runs_unchanged_on_stream(spark, tmp_path):
    """chunk_documents is a pure map pipeline, so the batch operator
    must run verbatim on a readStream frame and emit the identical
    chunk set."""
    import os

    from sarfile_analyzer_ng_spark.functions.text import chunk_documents

    src = str(tmp_path / "chunk_src")
    os.makedirs(src)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    docs.toPandas().to_parquet(f"{src}/docs.parquet", index=False)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.format("parquet").schema(schema).load(src)
    out = chunk_documents(stream, "text", "doc_id", chunk_tokens=32, overlap=8)
    q = (
        out.writeStream.format("memory").queryName("chunk_stream_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["doc_id"], r["chunk_id"], r["chunk_text"]) for r in
           spark.table("chunk_stream_test").collect()}
    want = {(r["doc_id"], r["chunk_id"], r["chunk_text"]) for r in
            chunk_documents(spark.read.parquet(src), "text", "doc_id",
                            chunk_tokens=32, overlap=8).collect()}
    assert got == want and len(got) > 1000


def test_near_dup_candidates_stream_flags_cross_batch_twins(spark, tmp_path):
    """ST7: exact twins arriving in a LATER micro-batch share all 16
    band keys with their base, so every twin must be emitted as a
    candidate — and (band state carrying across batches) anchored to
    a document from the earlier batch, its own base for ≥ 90% of
    twins. Streaming signatures must equal the batch family's."""
    import os

    src = str(tmp_path / "neardup_src")
    os.makedirs(src)
    docs = (
        load_table(spark, SF_DIR, "documents")
        .where(F.col("doc_id") < 60)
        .select("doc_id", "text")
    )
    twins = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    base_pdf = docs.toPandas().sort_values("doc_id")
    twin_pdf = twins.toPandas().sort_values("doc_id")
    for i, sl in enumerate([base_pdf, twin_pdf]):
        p = f"{src}/chunk{i}.parquet"
        sl.to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = SO.near_dup_candidates_stream(stream, "text", "doc_id")
    q = (
        out.writeStream.format("memory").queryName("neardup_stream_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("neardup_stream_test").collect()

    emitted = {}
    for r in got:
        emitted.setdefault(r["doc"], set()).add(r["anchor"])
    twin_ids = set(twin_pdf["doc_id"])
    flagged_twins = twin_ids & set(emitted)
    assert flagged_twins == twin_ids  # every twin is a candidate
    anchored_to_base = sum(
        1 for t in twin_ids if (t - 1_000_000) in emitted[t]
    )
    assert anchored_to_base >= 0.9 * len(twin_ids)

    # no doc is ever emitted against itself
    assert all(r["doc"] != r["anchor"] for r in got)

    # streaming band keys == batch family values: a twin's emitted
    # bands must all be band keys the BATCH pipeline computes for its
    # base document (identical text → identical signature)
    from sarfile_analyzer_ng_spark.functions.dedup import (
        minhash_bands,
        minhash_signatures,
    )

    base3 = minhash_signatures(
        docs.where(F.col("doc_id") == 3), "text", "doc_id"
    )
    batch_bands = {
        r["band"]
        for r in base3.select(
            F.explode(minhash_bands(F.col("sig"), 16, 4)).alias("band")
        ).collect()
    }
    stream_bands = {r["band"] for r in got if r["doc"] == 1_000_003}
    assert stream_bands and stream_bands <= batch_bands


def test_bloom_probe_runs_unchanged_on_stream(spark, tmp_path):
    """The bloom bitmap is a static 1-row frame, so probing is a
    stream-static broadcast join: the EXACT batch operator must run
    unchanged on a readStream frame and produce the batch verdicts."""
    import os

    from sarfile_analyzer_ng_spark.operators import sketches as SK

    src = str(tmp_path / "bloom_src")
    os.makedirs(src)
    docs = (
        load_table(spark, SF_DIR, "documents")
        .where(F.col("doc_id") < 40)
        .select("doc_id", "text")
    )
    docs.toPandas().to_parquet(f"{src}/c0.parquet", index=False)
    ref = docs.where(F.col("doc_id") % 2 == 0)
    bloom = SK.bloom_build(ref, "text", m_bits=1 << 14, k_hashes=4)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.format("parquet").schema(schema).load(src)
    out = SK.bloom_probe(stream, "text", bloom, m_bits=1 << 14, k_hashes=4)
    q = (
        out.writeStream.format("memory").queryName("bloom_stream_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: r["in_bloom"]
           for r in spark.table("bloom_stream_test").collect()}
    want = {r["doc_id"]: r["in_bloom"]
            for r in SK.bloom_probe(docs, "text", bloom,
                                    m_bits=1 << 14, k_hashes=4).collect()}
    assert got == want
    assert all(got[i] for i in got if i % 2 == 0)


def test_passage_novelty_stream_matches_batch_firsts(spark, tmp_path):
    """ST9: streaming passage dedup must keep exactly the batch
    operator's surviving (doc, idx) passages when files arrive in doc
    order, with repeats planted across micro-batch boundaries."""
    import os

    import pandas as pd

    src = str(tmp_path / "passage_src")
    os.makedirs(src)
    rows = [
        (1, "x y x y a b"),     # within-doc repeat of "x y"
        (2, "x y z w"),         # cross-doc repeat, same micro-batch
        (3, "p q r s"),
        (10, "x y p q c d"),    # repeats from an EARLIER micro-batch
        (11, "c d e f"),        # repeat of a passage first seen in doc 10
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["ts"] = pd.to_datetime(1_700_000_000 + pdf["doc_id"], unit="s", utc=True)
    for i, sl in enumerate([pdf.iloc[:3], pdf.iloc[3:]]):
        path = f"{src}/chunk{i}.parquet"
        sl.to_parquet(path, index=False, coerce_timestamps="us",
                      allow_truncated_timestamps=True)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = SO.passage_novelty_stream(stream, "text", "doc_id", "ts",
                                    "1 hour", passage_words=2)
    q = (
        out.writeStream.format("memory").queryName("passage_stream_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["doc_id"], r["idx"], r["passage"])
           for r in spark.table("passage_stream_test").collect()}

    # python reference of the batch first-occurrence rule
    seen, expect = set(), set()
    for doc, text in rows:  # already in (doc, idx) order
        w = text.split()
        for idx in range((len(w) + 1) // 2):
            p = " ".join(w[idx * 2: idx * 2 + 2])
            if p not in seen:
                seen.add(p)
                expect.add((doc, idx, p))
    assert got == expect
    # the cross-micro-batch repeats really were cut
    assert (10, 0, "x y") not in got and (11, 0, "c d") not in got


def test_corpus_stats_stream_matches_batch_card(spark, tmp_path):
    """ST10: the streaming ingest monitor's per-(window, source)
    counts and mean quality must equal the batch computation over the
    same files."""
    import os

    from sarfile_analyzer_ng_spark.functions.text import quality_score

    src = str(tmp_path / "cs_src")
    os.makedirs(src)
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "source", "text")
        .withColumn("ts", F.timestamp_seconds(1_700_000_000 + F.col("doc_id")))
    )
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    pdf["ts"] = pdf["ts"].dt.tz_localize("UTC")
    n = len(pdf)
    for i, sl in enumerate([pdf.iloc[: n // 2], pdf.iloc[n // 2:]]):
        path = f"{src}/chunk{i}.parquet"
        sl.to_parquet(path, index=False, coerce_timestamps="us",
                      allow_truncated_timestamps=True)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = SO.corpus_stats_stream(stream, "ts", "text", "source",
                                 "1 minute", "10 minutes")
    # complete mode: emit every window, not just watermark-closed ones
    # (the finite test stream never advances past its last window)
    q = (
        out.writeStream.format("memory").queryName("cs_stream_test")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["bucket"], r["source"]): (r["n_docs"], r["n_tokens"],
                                        round(r["avg_quality"], 6))
           for r in spark.table("cs_stream_test").collect()}

    batch = (
        quality_score(spark.read.parquet(src), "text")
        .groupBy(F.window("ts", "1 minute").alias("w"), "source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_words").cast("long").alias("n_tokens"),
             F.avg("quality").alias("avg_quality"))
    )
    want = {(r["w"]["start"], r["source"]): (r["n_docs"], r["n_tokens"],
                                            round(r["avg_quality"], 6))
            for r in batch.collect()}
    assert got == want and len(want) > 0


def test_semdedup_stream_matches_batch_verdicts(spark, tmp_path):
    """ST11: streaming SemDeDup must reproduce the batch pruner's
    (cluster, kept) verdicts on a twin-planted corpus, with twins
    arriving in a LATER micro-batch than their bases (anchor state
    carries across batches). Assignment uses the same centroids as
    the batch kmeans_lloyd_exact(iters=1) run: its smallest-id init."""
    import os

    from sarfile_analyzer_ng_spark.functions import similarity as S

    src = str(tmp_path / "semdedup_src")
    os.makedirs(src)
    base = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .where(F.col("vec_id") < 60)
        .select("vec_id", "embedding")
    )
    twins = base.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    base_pdf = base.toPandas().sort_values("vec_id")
    twin_pdf = twins.toPandas().sort_values("vec_id")
    for i, sl in enumerate([base_pdf, twin_pdf]):
        p = f"{src}/chunk{i}.parquet"
        sl.to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    corpus = base.unionByName(twins)
    assigned = S.kmeans_lloyd_exact(
        corpus, "vec_id", "embedding", k=4, iters=1
    )
    batch = {
        r["vec_id"]: (int(r["cluster"]), bool(r["kept"]))
        for r in S.semdedup(
            corpus, "vec_id", "embedding", tau=0.8, assigned=assigned
        ).collect()
    }

    # the stream assigns against the SAME centroid frame the batch
    # assignment ranked with (kmeans_centroids is the shared model)
    cents = [
        (int(r["cluster"]), [float(x) for x in r["c"]])
        for r in S.kmeans_centroids(
            corpus, "vec_id", "embedding", k=4, iters=1
        ).collect()
    ]
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = SO.semdedup_verdicts_stream(
        stream, "vec_id", "embedding", cents, tau=0.8
    )
    q = (
        out.writeStream.format("memory").queryName("semdedup_stream_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("semdedup_stream_test").collect()

    stream_verdicts = {
        r["doc"]: (int(r["cluster"]), bool(r["kept"])) for r in got
    }
    assert stream_verdicts == batch
    # every twin is dropped against its own base, which arrived in the
    # EARLIER micro-batch — anchor state crossed the batch boundary
    twin_rows = [r for r in got if r["doc"] >= 1_000_000]
    assert twin_rows and all(not r["kept"] for r in twin_rows)
    assert all(r["anchor"] == r["doc"] - 1_000_000 for r in twin_rows)


def test_semdedup_stream_kept_only_divergence_on_chain(spark, tmp_path):
    """ST11 contract pin (round-7 directive): on a transitive chain
    a~b, b~c, a!~c the stream and batch verdicts MUST diverge — batch
    compares against any smaller-id member, so c is dropped against
    the already-dropped b; the stream compares against KEPT anchors
    only, so c survives (b never joined the anchor set). This is the
    documented kept-only trade, pinned by a failing-case example
    instead of prose."""
    import math
    import os

    from sarfile_analyzer_ng_spark.functions import similarity as S

    def at(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    # cos(35deg) ~ 0.819 >= tau=0.8; cos(70deg) ~ 0.342 < tau
    rows = [(1, at(0.0)), (2, at(35.0)), (3, at(70.0))]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    assigned = S.kmeans_lloyd_exact(corpus, "vec_id", "embedding",
                                    k=1, iters=1)
    batch = {
        r["vec_id"]: bool(r["kept"])
        for r in S.semdedup(
            corpus, "vec_id", "embedding", tau=0.8, assigned=assigned
        ).collect()
    }
    # batch: a kept; b ~ a dropped; c ~ b (a smaller-id MEMBER) dropped
    assert batch == {1: True, 2: False, 3: False}

    src = str(tmp_path / "chain_src")
    os.makedirs(src)
    corpus.toPandas().to_parquet(f"{src}/c0.parquet", index=False)
    cents = [
        (int(r["cluster"]), [float(x) for x in r["c"]])
        for r in S.kmeans_centroids(
            corpus, "vec_id", "embedding", k=1, iters=1
        ).collect()
    ]
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = SO.semdedup_verdicts_stream(
        stream, "vec_id", "embedding", cents, tau=0.8
    )
    q = (
        out.writeStream.format("memory").queryName("semdedup_chain_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["doc"]: (bool(r["kept"]), r["anchor"])
           for r in spark.table("semdedup_chain_test").collect()}
    # stream: a kept anchor; b ~ a dropped (never an anchor); c finds
    # no KEPT anchor within tau -> kept. The divergence on doc 3 is
    # the contract.
    assert got == {1: (True, None), 2: (False, 1), 3: (True, None)}


def test_logreg_scoring_runs_unchanged_on_stream(spark, tmp_path):
    """The trained quality classifier applies at ingest with ZERO
    streaming-specific code (the ST6/ST8 stream-static pattern):
    logreg_score is a stateless codegen map stage, so the EXACT batch
    operator runs on a readStream frame and emits the batch verdicts."""
    import os

    from sarfile_analyzer_ng_spark.functions import classify as C
    from sarfile_analyzer_ng_spark.functions.text import quality_score

    src = str(tmp_path / "logreg_src")
    os.makedirs(src)
    docs = (
        load_table(spark, SF_DIR, "documents")
        .where(F.col("doc_id") < 80)
        .select("doc_id", "source", "text")
    )
    docs.toPandas().to_parquet(f"{src}/c0.parquet", index=False)

    def features(df):
        qs = quality_score(df, "text")
        return qs.select(
            "doc_id",
            F.when(F.col("source").isin("src0", "src1"), 1)
            .otherwise(0).alias("label"),
            (F.col("punct_ratio")).alias("x1"),
            (F.col("stopword_ratio")).alias("x2"),
        )

    batch_feats = features(docs)
    w = C.logreg_train(batch_feats, ["x1", "x2"], "label", iters=3)
    want = {
        r["doc_id"]: (r["p_good"], r["pred"])
        for r in C.logreg_score(batch_feats, ["x1", "x2"], w).collect()
    }

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.format("parquet").schema(schema).load(src)
    out = C.logreg_score(features(stream), ["x1", "x2"], w)
    q = (
        out.writeStream.format("memory").queryName("logreg_stream_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["p_good"], r["pred"])
        for r in spark.table("logreg_stream_test").collect()
    }
    assert got == want and len(got) == 80


def test_duplicated_grams_stream_matches_batch_occurrences(spark, tmp_path):
    """ST13: the streaming duplicated-gram detector must flag exactly
    the (doc, pos) gram occurrences whose hash the BATCH q106 front
    half counts more than once — with the duplicate arriving in a
    LATER micro-batch than the original (counter state crosses the
    boundary), and hash values identical between engines."""
    import os

    from sarfile_analyzer_ng_spark.functions.dedup import _pos_gram_hashes

    src = str(tmp_path / "dupgram_src")
    os.makedirs(src)
    base = (
        load_table(spark, SF_DIR, "documents")
        .where(F.col("doc_id") < 40)
        .select("doc_id", "text")
    )
    twins = base.where(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    for i, frame in enumerate([base, twins]):
        pth = f"{src}/chunk{i}.parquet"
        frame.toPandas().to_parquet(pth, index=False)
        os.utime(pth, (1_700_000_000 + i, 1_700_000_000 + i))

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = SO.duplicated_grams_stream(stream, "text", "doc_id", k=8)
    q = (
        out.writeStream.format("memory").queryName("dupgram_stream_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("dupgram_stream_test").collect()

    corpus = base.unionByName(twins)
    hashed = _pos_gram_hashes(corpus, "text", "doc_id", 8)
    batch_occ = {
        r["h"]: r["count"]
        for r in hashed.groupBy("h").count()
        .where(F.col("count") > 1).collect()
    }
    # every emitted hit is a batch-duplicated gram hash (value parity)
    assert got and all(r["h"] in batch_occ for r in got)
    # and each duplicated hash's occurrences beyond the first are all
    # emitted: total emissions = total occurrences - distinct hashes
    assert len(got) == sum(c - 1 for c in batch_occ.values())
    # twins arrived in the LATER micro-batch: every twin doc has hits
    # (its grams were first seen in the earlier batch)
    twin_docs = {r["doc"] for r in got if r["doc"] >= 1_000_000}
    assert twin_docs == {1_000_000 + i for i in range(10)}


def test_duplicated_grams_stream_short_and_null_docs(spark, tmp_path):
    """Short (< k tokens) and null-text documents emit NOTHING — like
    the batch gram builder — instead of crashing the query or hashing
    phantom empty grams that falsely link unrelated documents."""
    import os
    import pandas as pd

    src = str(tmp_path / "shortdoc_src")
    os.makedirs(src)
    pd.DataFrame(
        {"doc_id": [1, 2, 3, 4],
         "text": ["one two three", "", None,
                  " ".join(f"w{i}" for i in range(12))]}
    ).to_parquet(f"{src}/c0.parquet", index=False)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.format("parquet").schema(schema).load(src)
    out = SO.duplicated_grams_stream(stream, "text", "doc_id", k=8)
    q = (
        out.writeStream.format("memory").queryName("shortdoc_stream_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("shortdoc_stream_test").collect()
    # doc 4 has 5 distinct grams, none repeated; docs 1-3 emit nothing
    assert got == []


def test_oov_scoring_runs_unchanged_on_stream(spark, tmp_path):
    """ST14: the fixed-vocabulary OOV scorer (functions/text.py:
    oov_score) is a stateless codegen map — the EXACT batch operator
    runs on a readStream frame (the ST6/ST8/ST12 stream-static
    pattern) and reproduces (1) the batch oov_score rows and (2) the
    corpus-derived vocab_coverage verdicts when handed that vocab."""
    import os

    from sarfile_analyzer_ng_spark.functions import text as TX

    src = str(tmp_path / "oov_src")
    os.makedirs(src)
    docs = (
        load_table(spark, SF_DIR, "documents")
        .where(F.col("doc_id") < 80)
        .select("doc_id", "text")
    )
    docs.toPandas().to_parquet(f"{src}/c0.parquet", index=False)

    # the vocabulary a tokenizer run would lock: corpus top-10 words
    words = docs.select(
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")
    ).where(F.col("w") != "")
    vocab = [
        r["w"]
        for r in words.groupBy("w").count()
        .orderBy(F.col("count").desc(), F.col("w").asc())
        .limit(10).collect()
    ]
    # scorer == corpus-derived coverage when handed the same vocab
    want = {tuple(r) for r in
            TX.vocab_coverage(docs, "text", "doc_id", 10).collect()}
    batch = {tuple(r) for r in
             TX.oov_score(docs, "text", "doc_id", vocab).collect()}
    assert batch == want and len(batch) == 80

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.format("parquet").schema(schema).load(src)
    out = TX.oov_score(stream, "text", "doc_id", vocab)
    q = (
        out.writeStream.format("memory").queryName("oov_stream_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.table("oov_stream_test").collect()}
    assert got == batch


def test_seasonal_scoring_runs_unchanged_on_stream(spark, tmp_path):
    """ST15: live ingest-side seasonal anomaly alerts — the q115
    baseline trains on history, freezes, and the EXACT batch
    seasonal_score (stateless broadcast join + filter) runs on a
    readStream frame, reproducing the batch verdicts (the
    ST6/ST8/ST12/ST14 stream-static pattern)."""
    import os

    from sarfile_analyzer_ng_spark.operators import timeseries as TS

    src = str(tmp_path / "seasonal_src")
    os.makedirs(src)
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    pdf = ev.toPandas()
    pdf["ts"] = pdf["ts"].dt.tz_localize("UTC")
    pdf.to_parquet(f"{src}/c0.parquet", index=False,
                   coerce_timestamps="us", allow_truncated_timestamps=True)

    hist = spark.read.parquet(src)
    baseline = TS.seasonal_baseline(hist, "ts", "value", ["event_type"])
    want = {r["event_id"]: (r["hour"], r["season_z"]) for r in
            TS.seasonal_score(hist, baseline, "ts", "value",
                              ["event_type"], 2.0).collect()}
    assert want  # threshold chosen so the gate data flags something

    schema = hist.schema
    stream = spark.readStream.format("parquet").schema(schema).load(src)
    out = TS.seasonal_score(stream, baseline, "ts", "value",
                            ["event_type"], 2.0)
    q = (
        out.writeStream.format("memory").queryName("seasonal_stream_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["event_id"]: (r["hour"], r["season_z"]) for r in
           spark.table("seasonal_stream_test").collect()}
    assert got == want


def test_image_dedup_stream_drops_reencoded_copies(spark, tmp_path):
    """ST16: streaming pHash dedup — a PNG/BMP re-encode of an image
    seen in an EARLIER micro-batch (identical pixels, identical
    64-bit pHash by construction) is dropped; distinct images pass;
    corrupt payloads never dedup against each other. Survivor pHash
    set must equal the batch keep-first rule."""
    import os

    import pandas as pd

    from tools.gen_media import _lcg_image, encode_bmp, encode_png, encode_ppm

    base0, base1, base2 = _lcg_image(1), _lcg_image(2), _lcg_image(3)
    t0 = 1_700_000_000
    chunk0 = [
        (1, t0 + 1, encode_ppm(base0)),
        (2, t0 + 2, encode_ppm(base1)),
        (3, t0 + 3, b"\x89PNG\r\n\x1a\njunk"),       # corrupt
    ]
    chunk1 = [
        (10, t0 + 60, encode_png(base0)),            # re-encode of 1 -> drop
        (11, t0 + 61, encode_bmp(base1)),            # re-encode of 2 -> drop
        (12, t0 + 62, encode_ppm(base2)),            # genuinely new -> keep
        (13, t0 + 63, b"\x89PNG\r\n\x1a\njunk2"),    # corrupt -> keep
    ]
    src = str(tmp_path / "media_src")
    os.makedirs(src)
    for i, rows in enumerate((chunk0, chunk1)):
        pdf = pd.DataFrame(
            {
                "media_id": pd.array([r[0] for r in rows], dtype="int64"),
                "ts": pd.to_datetime([r[1] for r in rows], unit="s",
                                     utc=True),
                "payload": [r[2] for r in rows],
            }
        )
        path = f"{src}/chunk{i}.parquet"
        pdf.to_parquet(path, index=False, coerce_timestamps="us",
                       allow_truncated_timestamps=True)
        os.utime(path, (t0 + i, t0 + i))

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = SO.image_dedup_stream(stream, "ts", "1 hour")
    q = (
        out.writeStream.format("memory").queryName("img_dedup_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["media_id"]: r["phash"] for r in
           spark.table("img_dedup_stream").collect()}

    # survivors: first arrival per hash + every corrupt audit row
    assert set(got) == {1, 2, 3, 12, 13}
    assert got[3] is None and got[13] is None
    # batch twin on the same files: keep-first per pHash
    from sarfile_analyzer_ng_spark.functions import multimodal as MM
    from sarfile_analyzer_ng_spark.functions.dedup import exact_dedup

    media = spark.read.parquet(src).withColumnRenamed("payload", "payload")
    hashes = MM.image_phash(media, payload_col="payload")
    batch_kept = exact_dedup(
        hashes.where(F.col("phash").isNotNull())
        .withColumn("h", F.col("phash").cast("string")),
        "h", "media_id",
    )
    assert ({r["phash"] for r in batch_kept.collect()}
            == {v for v in got.values() if v is not None})


def test_incremental_near_dup_stream_matches_batch_q121(spark, tmp_path):
    """ST17: streaming near-dup screening against a static reference
    must flag exactly the batch operator's pair set (the portable
    signature arithmetic is shared, so band keys and estimates are
    value-identical), with re-crawls planted across micro-batch
    boundaries."""
    import os

    import pandas as pd

    from sarfile_analyzer_ng_spark.functions import dedup as D

    ref_rows = [(i, f"reference document number {i} about topic {i % 7} "
                    f"with plenty of shared vocabulary tokens everywhere")
                for i in range(30)]
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    t0 = 1_700_000_000
    batch_rows = [
        (100, ref_rows[3][1] + " tail", t0 + 1),          # near-dup
        (101, "totally unrelated submarine sonar arrays payload "
              "with oceanographic acoustics terminology", t0 + 2),
        (102, ref_rows[11][1], t0 + 61),                  # exact (batch 2)
        (103, "another clean novel document regarding alpine "
              "glacier dynamics and firn densification", t0 + 62),
    ]
    src = str(tmp_path / "nd_src")
    os.makedirs(src)
    for i, sl in enumerate((batch_rows[:2], batch_rows[2:])):
        pdf = pd.DataFrame(
            {
                "doc_id": pd.array([r[0] for r in sl], dtype="int64"),
                "text": [r[1] for r in sl],
                "ts": pd.to_datetime([r[2] for r in sl], unit="s", utc=True),
            }
        )
        path = f"{src}/chunk{i}.parquet"
        pdf.to_parquet(path, index=False, coerce_timestamps="us",
                       allow_truncated_timestamps=True)
        os.utime(path, (t0 + i, t0 + i))

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = SO.incremental_near_dup_stream(stream, ref, "text", "doc_id")
    q = (
        out.writeStream.format("memory").queryName("nd_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["doc_id"], r["ref_id"]): r["est_jaccard"]
           for r in spark.table("nd_stream").collect()}
    assert (100, 3) in got and (102, 11) in got
    assert got[(102, 11)] == 1.0
    assert all(b not in (101, 103) for b, _ in got)

    # batch parity: the flagged pair set equals q121's operator at the
    # same threshold over the same batch/ref
    batch_df = spark.read.parquet(src).select("doc_id", "text")
    b = D.incremental_near_dups(batch_df, ref, "text", "doc_id")
    flagged_batch = {r["doc_id"] for r in b.where(F.col("is_dup") == 1).collect()}
    assert flagged_batch == {bid for bid, _ in got}


def test_incremental_near_dup_stream_max_df_caps_ref_bands(spark, tmp_path):
    """r9: ST17's static-side hot-band cap. A reference corpus with 40
    templated copies would fan every arriving boilerplate doc out to
    40 candidate rows per band; with the cap the hot reference bands
    are dropped at plan time, so the arriving boilerplate doc flags
    nothing while a distinctive re-crawl still flags its corpus
    twin."""
    import os

    import pandas as pd

    boiler = "constant boilerplate legal disclaimer text repeated on every page"
    distinct_txt = ("a very distinctive document about glacier firn "
                    "densification rates in polar accumulation zones")
    ref_rows = [(i, boiler) for i in range(40)] + [(900, distinct_txt)]
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    t0 = 1_700_000_000
    pdf = pd.DataFrame(
        {
            "doc_id": pd.array([1000, 1900], dtype="int64"),
            "text": [boiler, distinct_txt],
            "ts": pd.to_datetime([t0 + 1, t0 + 2], unit="s", utc=True),
        }
    )
    src = str(tmp_path / "cap_src")
    os.makedirs(src)
    pdf.to_parquet(f"{src}/chunk0.parquet", index=False,
                   coerce_timestamps="us", allow_truncated_timestamps=True)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = SO.incremental_near_dup_stream(stream, ref, "text", "doc_id",
                                         max_df=5)
    q = (
        out.writeStream.format("memory").queryName("nd_cap_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["doc_id"], r["ref_id"]) for r in
           spark.table("nd_cap_stream").collect()}
    assert got == {(1900, 900)}


def test_bm25_screen_stream_matches_batch_scores(spark, tmp_path):
    """ST18: streaming BM25 screening scores arriving docs exactly
    like the batch scorer (shared row-local implementation), across
    micro-batch boundaries, with the min_score cut applied."""
    import os

    import pandas as pd

    from sarfile_analyzer_ng_spark.functions import retrieval as RV

    corpus_rows = [
        (i, f"indexed corpus document {i} about topic{i % 5} with "
            f"retrieval terms everywhere")
        for i in range(20)
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    qdf = spark.createDataFrame(
        [(1, "topic3 retrieval"), (2, "submarine sonar")],
        "query_id long, query string",
    )
    model, avgdl = RV.bm25_model(corpus, qdf, "text", "doc_id")
    assert model and avgdl > 0
    # 'submarine'/'sonar' never occur in the corpus -> query 2 has no
    # model terms and can never fire
    assert {q for q, _, _ in model} == {1}

    t0 = 1_700_000_000
    arriving = [
        (100, "fresh document discussing topic3 retrieval quality", t0 + 1),
        (101, "unrelated text about alpine glaciers", t0 + 2),
        (102, "more retrieval content regarding topic3 corpus terms",
         t0 + 61),
    ]
    src = str(tmp_path / "bm25_src")
    os.makedirs(src)
    for i, sl in enumerate((arriving[:2], arriving[2:])):
        pdf = pd.DataFrame(
            {
                "doc_id": pd.array([r[0] for r in sl], dtype="int64"),
                "text": [r[1] for r in sl],
                "ts": pd.to_datetime([r[2] for r in sl], unit="s", utc=True),
            }
        )
        path = f"{src}/chunk{i}.parquet"
        pdf.to_parquet(path, index=False, coerce_timestamps="us",
                       allow_truncated_timestamps=True)
        os.utime(path, (t0 + i, t0 + i))

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = SO.bm25_screen_stream(stream, "text", "doc_id", model, avgdl,
                                min_score=0.1)
    q = (
        out.writeStream.format("memory").queryName("bm25_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["query_id"]): (r["score"], r["n_terms_hit"])
        for r in spark.table("bm25_stream").collect()
    }
    batch = {
        (r["doc_id"], r["query_id"]): (r["score"], r["n_terms_hit"])
        for r in RV.bm25_score_rows(
            spark.read.parquet(src), "text", "doc_id", model, avgdl
        ).where(F.col("score") >= 0.1).collect()
    }
    assert got == batch
    assert (100, 1) in got and (102, 1) in got  # topic3+retrieval docs
    assert all(d != 101 for d, _ in got)        # no shared terms
    assert all(qid == 1 for _, qid in got)      # query 2 never fires


def test_ewma_stream_exact_recursion_across_batches(spark, tmp_path):
    """ST19: the streamed adjusted-EWMA recursion must be continuous
    across micro-batch boundaries (pandas ewm(adjust=True) over the
    whole series), equal the TRUNCATED batch operator exactly for the
    first W samples, and stay within (1-alpha)^W after."""
    import os

    import pandas as pd

    from sarfile_analyzer_ng_spark.operators import timeseries as TS

    t0 = 1_700_000_000
    vals = [float((i * 13) % 17) + 0.25 for i in range(24)]
    rows = [("cpu", t0 + 60 * i, v) for i, v in enumerate(vals)]
    src = str(tmp_path / "ewma_src")
    os.makedirs(src)
    # split mid-series so the recursion must cross a batch boundary
    for i, sl in enumerate((rows[:9], rows[9:])):
        pdf = pd.DataFrame(
            {
                "series": [r[0] for r in sl],
                "ts": pd.to_datetime([r[1] for r in sl], unit="s", utc=True),
                "value": [r[2] for r in sl],
            }
        )
        path = f"{src}/chunk{i}.parquet"
        pdf.to_parquet(path, index=False, coerce_timestamps="us",
                       allow_truncated_timestamps=True)
        os.utime(path, (t0 + i, t0 + i))

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = SO.ewma_stream(stream, "ts", "series", "value", alpha=0.3)
    q = (
        out.writeStream.format("memory").queryName("ewma_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("ewma_stream")
        .orderBy("ts")
        .collect()
    )
    assert len(got) == len(vals)

    exp = pd.Series(vals).ewm(alpha=0.3, adjust=True).mean()
    for i, r in enumerate(got):
        assert r["ewma"] == round(round(exp[i], 8), 4)
        if i == 0:
            assert r["forecast"] is None or pd.isna(r["forecast"])
        else:
            assert r["forecast"] == round(round(exp[i - 1], 8), 4)
            assert r["resid"] == round(round(vals[i] - exp[i - 1], 8), 4)

    # vs the truncated batch operator: exact for the first W samples,
    # within (1-alpha)^W relative after
    import datetime as dt

    bdf = spark.createDataFrame(
        [(i, "cpu",
          dt.datetime.fromtimestamp(t0 + 60 * i, dt.timezone.utc)
          .replace(tzinfo=None), v)
         for i, v in enumerate(vals)],
        "event_id long, series string, ts timestamp, value double",
    )
    batch = {
        r["event_id"]: r["ewma"]
        for r in TS.ewma_smooth(
            bdf, "ts", "value", ["series"], order_tiebreak=["event_id"],
            alpha=0.3, window=16,
        ).collect()
    }
    for i, r in enumerate(got):
        if i < 16:
            assert r["ewma"] == batch[i]
        else:
            assert abs(r["ewma"] - batch[i]) <= abs(batch[i]) * 0.7 ** 16 + 1e-4


def test_snapshot_status_stream_classifies_and_matches_batch(spark, tmp_path):
    """ST20: streaming CDC verdicts (new/changed/unchanged) against a
    static previous snapshot, spanning micro-batch boundaries; the
    non-removed verdict counts must match batch snapshot_diff on the
    same frames."""
    import os

    import pandas as pd

    from sarfile_analyzer_ng_spark.functions import pipeline as P

    ref = spark.createDataFrame(
        [(1, "s1", "alpha"), (2, "s1", "beta"), (3, "s2", "gamma")],
        "doc_id long, source string, text string",
    )
    arriving = [
        (2, "s1", "beta"),           # unchanged
        (3, "s2", "gamma CHANGED"),  # changed (batch 2)
        (4, "s2", "delta"),          # new (batch 2)
    ]
    src = str(tmp_path / "cdc_src")
    os.makedirs(src)
    for i, sl in enumerate((arriving[:1], arriving[1:])):
        pdf = pd.DataFrame(
            {
                "doc_id": pd.array([r[0] for r in sl], dtype="int64"),
                "source": [r[1] for r in sl],
                "text": [r[2] for r in sl],
            }
        )
        path = f"{src}/chunk{i}.parquet"
        pdf.to_parquet(path, index=False)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = SO.snapshot_status_stream(stream, ref, "doc_id", "text")
    q = (
        out.writeStream.format("memory").queryName("cdc_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: r["status"] for r in spark.table("cdc_stream").collect()}
    assert got == {2: "unchanged", 3: "changed", 4: "new"}

    # batch parity: statuses agree with snapshot_diff (stream's "new"
    # is batch's "added"; "removed" is batch-only by construction)
    batch_new = spark.read.parquet(src)
    diff = {r["status"]: r["n_docs"] for r in
            P.snapshot_diff(ref, batch_new, "doc_id", "text")
            .groupBy("status").agg(F.sum("n_docs").alias("n_docs"))
            .collect()}
    assert diff["added"] == sum(1 for s in got.values() if s == "new")
    assert diff["changed"] == sum(1 for s in got.values() if s == "changed")
    assert diff["unchanged"] == sum(1 for s in got.values() if s == "unchanged")
    assert diff["removed"] == 1  # doc 1 — observable only batch-side


def test_snapshot_status_stream_is_stateless(spark, tmp_path):
    """ST20 carries no stream state: the physical plan has no
    stateful operator (no watermark, no dedup, no flatMapGroups) —
    re-classification of a re-arriving id is intentional."""
    import os

    import pandas as pd

    ref = spark.createDataFrame(
        [(1, "x", "t")], "doc_id long, source string, text string"
    )
    src = str(tmp_path / "cdc2_src")
    os.makedirs(src)
    pd.DataFrame(
        {"doc_id": pd.array([1, 1], dtype="int64"),
         "source": ["x", "x"], "text": ["t", "t2"]}
    ).to_parquet(f"{src}/c.parquet", index=False)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.format("parquet").schema(schema).load(src)
    )
    out = SO.snapshot_status_stream(stream, ref, "doc_id", "text")
    q = (
        out.writeStream.format("memory").queryName("cdc2_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(r["status"] for r in spark.table("cdc2_stream").collect())
    assert got == ["changed", "unchanged"]  # both rows classified


def test_cms_stream_counters_match_batch_sketch(spark, tmp_path):
    """ST21: the streaming CMS counter state after all micro-batches
    equals cms_build over the same rows (shared hash family), and the
    state is at most depth*width cells regardless of arrivals."""
    import os

    import pandas as pd

    from sarfile_analyzer_ng_spark.operators import sketches as SK

    words = (["spark"] * 5 + ["flink"] * 3 + ["duck"] * 2 +
             ["iceberg", "arrow", "parquet"])
    src = str(tmp_path / "cms_src")
    os.makedirs(src)
    for i, sl in enumerate((words[:6], words[6:])):
        pdf = pd.DataFrame({"t": sl})
        path = f"{src}/chunk{i}.parquet"
        pdf.to_parquet(path, index=False)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    W, D = 16, 4
    out = SO.cms_stream(stream, "t", width=W, depth=D)
    q = (
        out.writeStream.format("memory").queryName("cms_stream_t")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["j"], r["b"]): r["cnt"]
           for r in spark.table("cms_stream_t").collect()}
    batch = {(r["j"], r["b"]): r["cnt"]
             for r in SK.cms_build(
                 spark.read.parquet(src), "t", width=W, depth=D
             ).collect()}
    assert got == batch
    assert len(got) <= W * D


def test_threshold_run_stream_emits_completed_runs_across_batches(spark, tmp_path):
    """ST22: a run spanning two micro-batches closes on the first cool
    sample and matches the batch operator; a still-open run stays in
    state (not emitted); a short run (< min_run) emits nothing."""
    import os

    import pandas as pd

    from sarfile_analyzer_ng_spark.operators import timeseries as TS2

    t0 = 1_700_000_000
    rows = [
        # run of 4 spanning the batch boundary, then a cool closer
        ("cpu", t0 + 0, 90.0), ("cpu", t0 + 60, 92.0),
        ("cpu", t0 + 120, 95.0),                       # batch 1 ends mid-run
        ("cpu", t0 + 180, 91.0), ("cpu", t0 + 240, 10.0),
        # short run (2 < min_run): must NOT emit
        ("cpu", t0 + 300, 99.0), ("cpu", t0 + 360, 99.0),
        ("cpu", t0 + 420, 5.0),
        # still-open run at stream end: must NOT emit
        ("cpu", t0 + 480, 93.0), ("cpu", t0 + 540, 94.0),
        ("cpu", t0 + 600, 95.0),
    ]
    src = str(tmp_path / "run_src")
    os.makedirs(src)
    for i, sl in enumerate((rows[:3], rows[3:])):
        pdf = pd.DataFrame(
            {
                "k": [r[0] for r in sl],
                "ts": pd.to_datetime([r[1] for r in sl], unit="s"),
                "value": [r[2] for r in sl],
            }
        )
        path = f"{src}/chunk{i}.parquet"
        pdf.to_parquet(path, index=False, coerce_timestamps="us",
                       allow_truncated_timestamps=True)
        os.utime(path, (t0 + i, t0 + i))

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = SO.threshold_run_stream(stream, "ts", "k", "value",
                                  threshold=80.0, min_run=3)
    q = (
        out.writeStream.format("memory").queryName("run_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("run_stream").collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_samples"] == 4 and r["peak_value"] == 95.0

    # batch parity on CLOSED runs: the batch operator over the same
    # rows reports this run identically (plus the stream-open tail
    # run, which only the batch sweep can close)
    batch = TS2.threshold_runs(
        spark.read.parquet(src), "ts", "value", ["k"],
        threshold=80.0, min_run=3,
    ).collect()
    closed = [b for b in batch
              if b["start_ts"] == r["start_ts"]]
    assert closed and closed[0]["n_samples"] == 4
    assert closed[0]["peak_value"] == 95.0


def test_cusum_stream_matches_batch_alarms_across_batches(spark, tmp_path):
    """ST23: the streamed one-sided CUSUM recursion with a frozen
    (mu, sd) baseline must raise exactly the batch operator's alarm
    set — including alarms whose accumulation spans a micro-batch
    boundary — with cusum values agreeing to the batch ladder's
    rounding tolerance."""
    import os

    import pandas as pd

    from sarfile_analyzer_ng_spark.operators import timeseries as TS

    t0 = 1_700_000_000
    base = [10.0, 11.0, 9.0, 10.5, 9.5, 10.0, 10.5, 9.5] * 3
    shifted = [v + 2.0 for v in base]
    vals = base + shifted
    rows = [("m", i, t0 + 60 * i, v) for i, v in enumerate(vals)]

    import datetime as dt

    batch_df = spark.createDataFrame(
        [(k, e, dt.datetime.fromtimestamp(s, dt.timezone.utc)
          .replace(tzinfo=None), v) for k, e, s, v in rows],
        "series string, event_id long, ts timestamp, value double",
    )
    batch_alarms = {
        r["event_id"]: r["cusum"]
        for r in TS.cusum_alarms(batch_df, "ts", "value", ["series"],
                                 slack_sigmas=0.5, h_sigmas=4.0,
                                 tiebreak="event_id").collect()
    }
    assert batch_alarms, "the planted shift must alarm in batch"

    import statistics
    mu = statistics.mean(vals)
    sd = statistics.stdev(vals)
    stats = spark.createDataFrame([("m", mu, sd)],
                                  "series string, mu double, sd double")

    src = str(tmp_path / "cusum_src")
    os.makedirs(src)
    # boundary INSIDE the alarm run (batch alarms start at event 33
    # for this series), so alarms land on both sides of it
    split = len(base) + 11
    for i, sl in enumerate((rows[:split], rows[split:])):
        pdf = pd.DataFrame(
            {
                "series": [r[0] for r in sl],
                "ts": pd.to_datetime([r[2] for r in sl], unit="s",
                                     utc=True),
                "value": [r[3] for r in sl],
            }
        )
        path = f"{src}/chunk{i}.parquet"
        pdf.to_parquet(path, index=False, coerce_timestamps="us",
                       allow_truncated_timestamps=True)
        os.utime(path, (t0 + i, t0 + i))

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = SO.cusum_stream(stream, "ts", "series", "value", stats,
                          slack_sigmas=0.5, h_sigmas=4.0)
    q = (
        out.writeStream.format("memory").queryName("cusum_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("cusum_stream").orderBy("ts").collect()

    ts_to_eid = {t0 + 60 * i: i for i in range(len(vals))}
    got_map = {
        ts_to_eid[int(r["ts"].timestamp())]: r["cusum"] for r in got
    }
    assert set(got_map) == set(batch_alarms)
    for eid, c in got_map.items():
        # batch rounds per-step on the oracle ladder, stream carries
        # the raw recursion — agree to ladder tolerance
        assert abs(c - batch_alarms[eid]) < 1e-3
    # alarms must span the micro-batch boundary (some before, some
    # after the split), or the test isn't exercising state carry-over
    assert min(got_map) < split <= max(got_map)


def test_trend_stream_matches_batch_fit_across_batches(spark, tmp_path):
    """ST24: the streamed incremental OLS slope must agree with the
    batch trend_fit on the full series (ladder tolerance) even when
    the series spans micro-batches, and early n<2 rows emit NULL."""
    import datetime as dt
    import os

    import pandas as pd

    from sarfile_analyzer_ng_spark.operators import timeseries as TS

    t0 = 1_700_000_000
    # y = 5 + 10*x_days + deterministic wiggle
    vals = [5.0 + 10.0 * (i * 3600 / 86400.0) + ((i * 7) % 5) * 0.01
            for i in range(30)]
    rows = [("disk", t0 + 3600 * i, v) for i, v in enumerate(vals)]

    batch_df = spark.createDataFrame(
        [(k, dt.datetime.fromtimestamp(s, dt.timezone.utc)
          .replace(tzinfo=None), v) for k, s, v in rows],
        "series string, ts timestamp, value double",
    )
    batch_slope = TS.trend_fit(batch_df, "ts", "value",
                               ["series"]).collect()[0]["slope_per_day"]

    src = str(tmp_path / "trend_src")
    os.makedirs(src)
    for i, sl in enumerate((rows[:13], rows[13:])):
        pdf = pd.DataFrame(
            {
                "series": [r[0] for r in sl],
                "ts": pd.to_datetime([r[1] for r in sl], unit="s",
                                     utc=True),
                "value": [r[2] for r in sl],
            }
        )
        path = f"{src}/chunk{i}.parquet"
        pdf.to_parquet(path, index=False, coerce_timestamps="us",
                       allow_truncated_timestamps=True)
        os.utime(path, (t0 + i, t0 + i))

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = SO.trend_stream(stream, "ts", "series", "value")
    q = (
        out.writeStream.format("memory").queryName("trend_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("trend_stream").orderBy("ts").collect()
    assert len(got) == len(vals)
    assert got[0]["slope_per_day"] is None          # n = 1
    assert got[0]["n_samples"] == 1
    assert got[-1]["n_samples"] == len(vals)
    # final streamed slope == batch fit (batch rounds its moments at
    # 8 before deriving; the stream carries raw sums)
    assert abs(got[-1]["slope_per_day"] - batch_slope) < 1e-4
    # slope stabilizes near 10/day well before the end
    assert abs(got[10]["slope_per_day"] - 10.0) < 0.2
