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

    Placement is the engine-portable :func:`~..util.shard_hash` of
    ``shard_key`` — the SAME scheme the export manifest
    (queries.q74_shard_manifest) and :func:`~..functions.text.
    pack_sequences` compute — written as a ``shard=K`` directory per
    shard, so a manifest planned from that hash describes the real
    export byte-for-byte (a plain ``repartition(n, col)`` would place
    rows by Spark-internal murmur3, which no manifest reader can
    replay). The pre-write ``repartition`` on the shard column
    colocates each shard value in one task → exactly one file per
    shard directory, and a document always lands in the same shard
    across runs, so re-exports are diffable. Compression stays off by
    default — downstream tokenizer jobs split plain files at arbitrary
    offsets; gzip shards would serialize each reader.
    """
    from ..util import shard_hash

    out = df.withColumn("shard", shard_hash(F.col(shard_key), num_shards))
    (
        out.repartition(num_shards, F.col("shard"))
        .write.mode(mode)
        .partitionBy("shard")
        .json(path)
    )


def read_jsonl(spark: SparkSession, path: str,
               schema: T.StructType) -> DataFrame:
    """Schema-pinned JSONL read (inference would re-scan the corpus)."""
    return spark.read.schema(schema).json(path)


def write_orc(df: DataFrame, path: str,
              partition_cols: list[str] | None = None,
              mode: str = "overwrite") -> None:
    """ORC export — the other columnar interchange format large Hive/
    Trino estates standardize on (predicate pushdown + column pruning
    work exactly as for parquet; Spark's ORC source is built in).
    Optionally Hive-partitioned like :func:`write_partitioned`."""
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.orc(path)


def read_orc(spark: SparkSession, path: str,
             schema: T.StructType | None = None) -> DataFrame:
    """ORC read; pass ``schema`` to pin types without a footer-scan
    inference pass (the read_csv discipline — at 100 TB even footer
    sampling across a million files is a job)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)
