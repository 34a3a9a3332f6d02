"""Skew-handling operators for hot keys.

sar data is naturally skewed — the `all` pseudo-CPU and a handful of
busy devices dominate row counts, and at 100 TB a single hot key pins
one reducer. Two standard remedies, expressed as reusable plans:

- **salted aggregation**: split each key into N salt shards, partially
  aggregate per shard (map-side + small shuffle), then merge shards.
  Results are bit-identical to the direct groupBy for decomposable
  aggregates; only the shuffle distribution changes.
- **replicated salt join**: for a join whose LEFT side has hot keys,
  shard the left by salt and replicate the (small) right side once per
  shard, so a hot key spreads over N reducers.

AQE's skew-join splitting (enabled in session.py) covers sort-merge
joins at runtime; these operators cover aggregations and the cases
where the planner must be forced up front.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (kind, source column, output alias); avg decomposes into sum+count
SaltedAgg = tuple[str, str, str]

_PARTIAL = {
    "sum": F.sum,
    # count(col) — NULL-skipping, matching SQL count(value) semantics
    "count": lambda c: F.count(F.col(c)),
    "min": F.min,
    "max": F.max,
}
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(df: DataFrame, keys: list[str], aggs: list[SaltedAgg],
               num_salts: int = 16, salt_on: list[str] | None = None) -> DataFrame:
    """Two-stage skew-proof aggregation.

    ``salt_on`` names columns whose hash spreads a hot key's rows over
    shards (default: all non-key columns). Stage 1 groups by
    (keys, salt) — each shard small; stage 2 merges shards per key.
    """
    salt_cols = (
        salt_on if salt_on is not None
        else [c for c in df.columns if c not in keys]
    )
    if not salt_cols:
        raise ValueError(
            "salted_agg: no non-key columns to derive a salt from — "
            "pass salt_on explicitly"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(num_salts))
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(
        *[_PARTIAL[kind](col).alias(alias) for kind, col, alias in aggs]
    )
    return partial.groupBy(*keys).agg(
        *[_MERGE[kind](alias).alias(alias) for kind, _, alias in aggs]
    )


def salted_avg(df: DataFrame, keys: list[str], value_col: str,
               out_col: str = "avg_value", num_salts: int = 16) -> DataFrame:
    """Average via salted sum+count (avg itself isn't shard-mergeable)."""
    merged = salted_agg(
        df, keys,
        [("sum", value_col, "_s"), ("count", value_col, "_c")],
        num_salts,
    )
    return merged.select(
        *keys, (F.col("_s") / F.col("_c")).alias(out_col)
    )


def replicated_salt_join(big: DataFrame, small: DataFrame, on: list[str],
                         num_salts: int = 8) -> DataFrame:
    """Join with hot keys on the big side: big rows get a deterministic
    salt shard; the small side is replicated once per shard (explode of
    a 0..N-1 array — N× its size, still tiny); the join key becomes
    (on, salt) so one hot key lands on N reducers."""
    salt_src = [c for c in big.columns if c not in on]
    if not salt_src:
        raise ValueError(
            "replicated_salt_join: the big side has no non-join columns "
            "to derive a salt from"
        )
    big_s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(num_salts))
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)).cast("array<long>"))
    )
    return big_s.join(small_s, on=[*on, "_salt"]).drop("_salt")
