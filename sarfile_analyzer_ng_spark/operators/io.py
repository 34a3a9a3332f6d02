"""Dataset I/O: CSV ingestion and partitioned parquet layouts.

The reference serves uploaded files and parquet caches
(parse_into_polars.py:14, api/services.py upload paths); at engine
scale the same needs become: schema-pinned CSV ingest (no inference
job over 100 TB), date/key-partitioned parquet output, and reads that
prune partitions before touching data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(spark: SparkSession, path: str, schema: T.StructType,
             header: bool = True, sep: str = ",") -> DataFrame:
    """CSV with an explicit schema: inference would be a second full
    scan of the input — never acceptable at scale — and pins types so
    downstream oracles/joins don't drift."""
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("sep", sep)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
        .csv(path)
    )


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      mode: str = "overwrite") -> None:
    """Hive-style partitioned parquet: one directory level per
    partition column. Readers filtering on those columns prune whole
    directories (PartitionFilters) before any file is opened."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_time_partitioned(df: DataFrame, path: str, ts_col: str,
                           mode: str = "overwrite") -> None:
    """Daily-partitioned layout for time-series facts — the natural
    sar layout (one sar file = one host-day). Queries with a date
    predicate touch only the matching day directories."""
    out = df.withColumn("p_date", F.to_date(F.col(ts_col)))
    write_partitioned(out, path, ["p_date"], mode)


def partition_filters(df: DataFrame) -> str:
    """The PartitionFilters shown at the scan — test/diagnostic hook."""
    text = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return "\n".join(l.strip() for l in text.splitlines() if "PartitionFilters" in l)


def write_jsonl_shards(df: DataFrame, path: str, num_shards: int,
                       shard_key: str, mode: str = "overwrite") -> None:
    """Sharded JSONL corpus export — the interchange format training
    pipelines consume (one JSON object per line, a bounded number of
    similar-size shard files).

    Sharding hashes ``shard_key`` into exactly ``num_shards``
    partitions (`repartition(n, col)` — deterministic placement given
    the key, unlike round-robin), so a document always lands in the
    same shard across runs and re-exports are diffable. Spark's json
    sink writes one file per partition: shard count is explicit and
    independent of the input layout. Compression stays off by default
    — downstream tokenizer jobs split plain files at arbitrary
    offsets; gzip shards would serialize each reader.
    """
    df.repartition(num_shards, F.col(shard_key)).write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str,
               schema: T.StructType) -> DataFrame:
    """Schema-pinned JSONL read (inference would re-scan the corpus)."""
    return spark.read.schema(schema).json(path)
