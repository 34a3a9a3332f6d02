"""Similarity search over an embedding column (array<float>).

Brute-force cosine is the correctness baseline; the LSH-bucketed
variant is the 100 TB path (candidate generation in buckets, exact
re-rank inside). Dot products/norms are JVM higher-order functions
(`zip_with` + `aggregate`) — no Python per row, math in float64.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..util import rnd


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_dup_pairs(emb: DataFrame, id_col: str, vec_col: str,
                     threshold: float, round_to: int = 4) -> DataFrame:
    """All pairs (a<b) with cosine ≥ threshold — embedding near-dup.

    Vectorized brute force: the (id, normalized-vector) matrix is
    broadcast to every executor once, and each Arrow batch of the
    corpus computes one float64 matmul against it (`mapInPandas`), so
    the O(n²) similarity work runs in BLAS instead of per-pair
    expression interpretation. Sound while the *matrix* (n×dim
    doubles) fits an executor — beyond that, route through
    :func:`lsh_buckets` for candidates and re-rank inside buckets.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = emb.sparkSession
    pdf = emb.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")).toPandas()
    pdf = pdf.sort_values("vid").reset_index(drop=True)
    ids = pdf["vid"].to_numpy()
    mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def batches(iterator):
        all_ids, all_mat = b_ids.value, b_mat.value
        for batch in iterator:
            rows_ids = batch["vid"].to_numpy()
            rows = np.array([np.asarray(v, dtype=np.float64) for v in batch["vec"]])
            rows = rows / np.linalg.norm(rows, axis=1, keepdims=True)
            sims = rows @ all_mat.T
            # round exactly like util.rnd: 8 digits then round_to
            sims = np.round(np.round(sims, 8), round_to)
            keep_r, keep_c = np.where(sims >= threshold)
            mask = rows_ids[keep_r] < all_ids[keep_c]
            keep_r, keep_c = keep_r[mask], keep_c[mask]
            yield pd.DataFrame(
                {
                    "id_a": rows_ids[keep_r],
                    "id_b": all_ids[keep_c],
                    "cosine": sims[keep_r, keep_c],
                }
            )

    src = emb.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    return src.mapInPandas(batches, out_schema)


def ann_topk_bruteforce(emb: DataFrame, queries: DataFrame, id_col: str,
                        vec_col: str, k: int, round_to: int = 4) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The (small) query set is broadcast; the corpus streams past it once
    — a map-side nested loop with no corpus shuffle. Rank via window
    per query with (cosine desc, id asc) — deterministic under ties.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm(F.col(vec_col)).alias("qnrm"),
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        norm(F.col(vec_col)).alias("cnrm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            rnd(
                dot(F.col("qvec"), F.col("cvec")) / (F.col("qnrm") * F.col("cnrm")),
                round_to,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def _plane(seed: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane: component j derived from
    xxhash64(seed, j), mapped to [-1, 1). Reproducible across runs."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.pmod(F.xxhash64(F.lit(seed), j.cast("string")), F.lit(20011)).cast("double")
            / F.lit(10005.5)
        ) - F.lit(1.0),
    )


def lsh_buckets(emb: DataFrame, id_col: str, vec_col: str, dim: int,
                num_planes: int = 16) -> DataFrame:
    """Random-hyperplane LSH: bucket = bit-string of sign(v·plane_i).
    Cosine-similar vectors land in the same bucket with high
    probability; the bucket key shuffles uniformly."""
    bits = [
        F.when(dot(F.col(vec_col), _plane(i, dim)) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(num_planes)
    ]
    return emb.withColumn("bucket", F.concat(*bits))


def ann_topk_lsh(emb: DataFrame, queries: DataFrame, id_col: str, vec_col: str,
                 dim: int, k: int, num_planes: int = 8,
                 round_to: int = 4) -> DataFrame:
    """Scale-path ANN: join query and corpus on LSH bucket, exact
    re-rank inside buckets. Recall < 1 by construction (that's the
    trade); the brute-force operator is the accuracy oracle."""
    cb = lsh_buckets(emb, id_col, vec_col, dim, num_planes).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"),
        norm(F.col(vec_col)).alias("cnrm"), "bucket",
    )
    qb = lsh_buckets(queries, id_col, vec_col, dim, num_planes).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
        norm(F.col(vec_col)).alias("qnrm"), "bucket",
    )
    scored = (
        cb.join(F.broadcast(qb), on="bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            rnd(
                dot(F.col("qvec"), F.col("cvec")) / (F.col("qnrm") * F.col("cnrm")),
                round_to,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )
