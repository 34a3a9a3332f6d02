"""Structured Streaming variants of the engine's time-series operators
(SURVEY.md §2.4).

The reference's "streaming" reality is incremental re-upload of sar
files (mng_sar.py) — each new file re-parsed and appended. Here that
becomes real incremental processing: a file source watches a
directory, new files flow through the same long schema, and windowed /
stateful operators maintain results continuously. Watermarks bound
state so a 100 TB/day stream can't accumulate unbounded aggregation
buffers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stream_events(spark: SparkSession, path: str, schema: T.StructType,
                  fmt: str = "parquet") -> DataFrame:
    """Incremental ingest (ST1): every new file in ``path`` is picked
    up exactly once — the streaming twin of the reference's re-upload
    flow."""
    return spark.readStream.format(fmt).schema(schema).load(path)


def windowed_agg(stream: DataFrame, ts_col: str, window: str, watermark: str,
                 by: list[str], aggs: list[Column]) -> DataFrame:
    """Windowed aggregation with late-data handling (ST2): tumbling
    windows over event time; the watermark drops state for windows
    older than the threshold, keeping memory bounded."""
    out = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), *by)
        .agg(*aggs)
    )
    agg_cols = [c for c in out.columns if c != "window" and c not in by]
    return out.select(F.col("window.start").alias("bucket"), *by, *agg_cols)


def run_batch_equivalent(stream_out: DataFrame, query_name: str,
                         spark: SparkSession) -> DataFrame:
    """Drain a (finite) stream into an in-memory table and return it as
    a batch DataFrame — the test harness for streaming parity."""
    q = (
        stream_out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete" if stream_out.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(query_name)


def sessionize_stream(stream: DataFrame, ts_col: str, key_col: str,
                      gap_seconds: int, watermark: str) -> DataFrame:
    """Stateful gap-based sessionization (ST3) using the built-in
    session window — state is per key, closed once the watermark passes
    the gap, emitted exactly once."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), f"{gap_seconds} seconds"),
            F.col(key_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select(
            key_col,
            "n_events",
            "session_start",
            "session_end",
        )
    )
