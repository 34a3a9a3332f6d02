"""Bucketed tables: pre-shuffled storage for repeated co-located joins.

At 100 TB the same fact-fact join (orders ⋈ lineitem on orderkey) runs
daily; bucketing both tables on the join key at write time removes the
shuffle from every subsequent join — the scan is already hash-
partitioned. This module wraps the write/read/verify cycle.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   num_buckets: int, sort_cols: list[str] | None = None) -> None:
    """Persist as a bucketed (optionally sorted) table. Sorting inside
    buckets additionally enables merge-join without a sort step."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # an in-memory catalog forgets tables between sessions but their
    # files survive in the warehouse dir; clear any orphan location
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith("file:"):
        warehouse = warehouse[len("file:"):]
    # the managed location is <warehouse>[/<db>.db]/<table>, with the
    # identifier lowercased; cover both the qualified and the
    # current-database form
    parts = [p.strip("`").lower() for p in table.split(".")]
    candidates = [os.path.join(warehouse, parts[-1])]
    if len(parts) == 2:
        candidates.append(
            os.path.join(warehouse, f"{parts[0]}.db", parts[1])
        )
    else:
        curdb = spark.catalog.currentDatabase()
        if curdb and curdb != "default":
            candidates.append(
                os.path.join(warehouse, f"{curdb}.db", parts[-1])
            )
    for orphan in candidates:
        if warehouse and os.path.isdir(orphan):
            shutil.rmtree(orphan, ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: list[str]) -> DataFrame:
    """Join two tables bucketed on the same keys/count — planner elides
    both Exchanges (verify with has_shuffle())."""
    return spark.table(left_table).join(spark.table(right_table), on=on)


def has_shuffle(df: DataFrame) -> bool:
    """True if the executed plan contains a SHUFFLE exchange
    (``Exchange hashpartitioning``/range/rr). BroadcastExchange doesn't
    count — a broadcast moves the small side, not the data set."""
    # Drain df's OWN QueryExecution so AQE finalizes THIS plan —
    # df.count() would execute a derived groupBy().count() plan and
    # leave df.executedPlan() at the initial adaptive guess, hiding
    # runtime sort-merge→broadcast conversions. A no-op foreach runs
    # the whole plan on the executors with NOTHING materialized to the
    # driver (verified: it finalizes this QueryExecution's adaptive
    # plan), so the helper is safe to point at a large frame.
    df.foreach(lambda _: None)
    text = df._jdf.queryExecution().executedPlan().toString()
    if "AdaptiveSparkPlan" in text and "isFinalPlan=true" not in text:
        # belt-and-braces: drive it once more before reading the plan
        df.foreach(lambda _: None)
        text = df._jdf.queryExecution().executedPlan().toString()
    return any(
        marker in text
        for marker in (
            "Exchange hashpartitioning",
            "Exchange rangepartitioning",
            "Exchange RoundRobinPartitioning",
            "ShuffleQueryStage",
        )
    )
