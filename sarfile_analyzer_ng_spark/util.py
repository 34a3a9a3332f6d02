"""Cross-engine helpers shared by operators and the oracle registry."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rnd(col: Column, digits: int = 4) -> Column:
    """Portable rounding for *computed* float aggregates (sum/avg/std/
    corr/percentile/cosine …).

    Different engines sum in different orders, so two correct results
    can differ by an ulp — and when the true value sits exactly on a
    rounding half-boundary (common for data generated with 2-decimal
    values), plain ``round`` flips the last digit between engines.
    Pre-rounding at 8 digits collapses both results to the same value
    first. Plain min/max/passthrough values don't need this (no
    arithmetic → bit-identical inputs).
    """
    return F.round(F.round(col, 8), digits)


def sql_rnd(expr: str, digits: int = 4) -> str:
    """The DuckDB-side twin of :func:`rnd` for oracle SQL strings.

    Spark's ``round`` goes through BigDecimal.valueOf(double) — i.e.
    the double's SHORTEST decimal representation — then HALF_UP.
    DuckDB's ``round`` works on the binary double, which lands one ulp
    the other way exactly at half boundaries. Casting through VARCHAR
    reproduces the shortest-repr step; the DECIMAL(38,8) cast rounds
    half-up at 8 digits like the inner ``F.round(x, 8)``."""
    return (
        f"round(CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(38,8)), {digits})::DOUBLE"
    )


def shard_hash(key: Column, num_shards: int) -> Column:
    """Engine-portable deterministic shard assignment for an integer
    id: Knuth multiplicative hash mod ``num_shards``, reproducible in
    ANSI SQL as ``(((key % 1000003) * 2654435761) % n + n) % n`` —
    unlike Spark's murmur3 ``repartition(n, col)`` placement, which no
    other engine (or manifest reader) can replay. One scheme shared by
    the JSONL shard writer, sequence packing, and the export manifest
    so they can never drift apart."""
    return F.pmod((key % 1_000_003) * 2654435761, F.lit(num_shards))


# Validity domain of the rnd/sql_rnd parity contract: DuckDB's final
# DECIMAL→DOUBLE converts the scaled integer first, so once
# |value|·10^digits exceeds 2^53 that int→double step rounds and the
# chain can land 1-2 ulp off Spark's BigDecimal path. Keep rounded
# magnitudes below ~9e15 / 10^digits (round4 → |v| < ~9e11; round2 →
# |v| < ~9e13). Every oracle value in queries.py is ≤ ~1e9.
RND_PARITY_MAX_SCALED = 2**53


def fan_out(df: DataFrame) -> DataFrame:
    """Spread a frame over the cluster before CPU-heavy map-only work.

    Map-only stages (regexp features, token explodes) inherit SCAN
    parallelism, and parquet can only split at row-group boundaries —
    a single-row-group file runs regexp over the whole corpus on one
    core no matter how many executors exist. Round-robin repartition
    to ``defaultParallelism`` when the input is coarser; a no-op at
    real scale, where scans already produce ≥ cores partitions.
    """
    if df.isStreaming:
        # partitioning is the stream source's concern (maxFilesPerTrigger
        # etc.), and .rdd is illegal on a streaming frame
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def rnd_np(a, digits: int = 4):
    """Numpy twin of :func:`rnd` for Arrow kernels that must compare a
    ROUNDED value against a threshold inside the batch (the block-
    matrix cosine and SemDeDup prune). ``np.round`` is half-to-EVEN on
    the binary double; Spark's ``round`` is HALF_UP on the shortest
    decimal repr — they disagree exactly at decimal half boundaries,
    which is exactly where threshold membership gets decided. Strategy:
    bulk np.round, then re-round the (rare) boundary-suspect entries
    through Decimal(repr(x)) — the same shortest-repr + HALF_UP path
    BigDecimal.valueOf takes — so kernel-side verdicts match the JVM /
    oracle bit-for-bit. Kernels that can emit raw values and round
    JVM-side should still prefer that (ann_topk_pq_arrow's pattern);
    this exists for kernels whose verdict must be computed in-batch.
    """
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    a = np.asarray(a, dtype=np.float64)
    r8 = np.round(a, 8)
    out = np.round(r8, digits)
    frac1 = np.abs(np.modf(np.abs(a) * 1e8)[0] - 0.5)
    frac2 = np.abs(np.modf(np.abs(r8) * (10.0 ** digits))[0] - 0.5)
    suspects = np.nonzero((frac1 < 1e-6) | (frac2 < 1e-6))
    if len(suspects[0]):
        q8 = Decimal(1).scaleb(-8)
        qd = Decimal(1).scaleb(-digits)
        flat_idx = zip(*suspects)
        for idx in flat_idx:
            v = Decimal(repr(float(a[idx]))).quantize(
                q8, rounding=ROUND_HALF_UP
            )
            out[idx] = float(v.quantize(qd, rounding=ROUND_HALF_UP))
    return out
