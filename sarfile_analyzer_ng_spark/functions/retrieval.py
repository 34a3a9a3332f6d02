"""Distributed sparse retrieval over the document corpus.

The reference serves its analytics over pre-parsed frames (reference
code/dia_compute_pl.py builds per-metric frames; api/services.py:80-
524 exposes them); it has no free-text retrieval. At LLM-pipeline
scale, BM25 retrieval is a first-class curation tool — finding the
corpus passages most relevant to an eval prompt is the standard
pre-step of decontamination audits ("what WOULD a search engine
return for this benchmark question?") and of retrieval-augmented
pretraining mixes (Borgeaud et al. 2022, RETRO; Izacard et al. 2022).

Design (Spark-first):

- The corpus side is the big side: one token explode → (doc, term,
  tf) agg and one (doc → length) agg, both combinable shuffles keyed
  by token/doc. Document frequencies reduce the term-count table one
  step further (term-keyed agg).
- The query side is an eval suite — bounded by contract (thousands,
  not billions) — so the per-term query list BROADCASTS and the
  score join stays a map-side hash join against the corpus postings.
  Nothing query-sized ever shuffles the corpus.
- Scoring is the Lucene BM25 variant: ``idf = ln(1 + (N - df + .5) /
  (df + .5))`` (always positive, unlike the classic Robertson idf)
  with tf saturation ``tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``.
  Query terms are DISTINCT per query (short-query convention —
  Lucene's practical default where repeated query terms just rescale
  scores); per-(query, doc, term) contributions are pre-rounded at 8
  digits before the sum so both engines aggregate identical values
  (the util.rnd contract), and the final score is rounded at 4.
- Top-k per query is a rank window partitioned by query — k rows per
  query leave the shuffle, ties broken by doc id so the cut is
  deterministic cross-engine.

At 100 TB: postings (term, doc, tf) is the classic inverted-index
shard layout — the shuffle key IS the index key, so the model never
sits on one machine; df/idf is |vocab|-sized; the query broadcast is
eval-suite-sized; per-query state after the window cut is k rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..util import fan_out, rnd

BM25_K1 = 1.2
BM25_B = 0.75


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return fan_out(df).select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("w"),
    )


def bm25_topk(corpus: DataFrame, queries: DataFrame, text_col: str,
              id_col: str, query_id_col: str = "query_id",
              query_col: str = "query", k: int = 5,
              k1: float = BM25_K1, b: float = BM25_B,
              round_to: int = 4) -> DataFrame:
    """Top-``k`` corpus documents per query under BM25.

    ``corpus``: (id_col, text_col, …) — the big side.
    ``queries``: (query_id_col, query_col) — bounded eval suite.

    Returns (query_id, rank, doc_id, score, n_terms_hit) with exactly
    the documents sharing ≥1 query term, ranked by (score DESC,
    doc ASC), cut at k.
    """
    toks = _tokens(corpus, text_col, id_col)
    # postings: term → (doc, tf); doclen: doc → dl
    postings = toks.groupBy("w", "doc").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    doclen = toks.groupBy("doc").agg(
        F.count(F.lit(1)).cast("double").alias("dl")
    )
    n_avg = doclen.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    df_tbl = postings.groupBy("w").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    qterms = (
        fan_out(queries)
        .select(
            F.col(query_id_col).alias("qid"),
            F.explode(
                F.split(F.lower(F.trim(F.col(query_col))), r"\s+")
            ).alias("w"),
        )
        .distinct()
    )
    # df is vocab-sized; cut it to query terms first so it broadcasts
    df_q = df_tbl.join(F.broadcast(qterms.select("w").distinct()), "w")
    scored = (
        postings
        .join(F.broadcast(qterms), "w")
        .join(F.broadcast(df_q), "w")
        .join(doclen, "doc")
        .crossJoin(F.broadcast(n_avg))
        .select(
            "qid", "doc",
            rnd(
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl")
                    )
                ),
                8,
            ).alias("contrib"),
        )
    )
    agg = scored.groupBy("qid", "doc").agg(
        rnd(F.sum("contrib"), round_to).alias("score"),
        F.count(F.lit(1)).alias("n_terms_hit"),
    )
    win = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("doc").asc()
    )
    return (
        agg.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("rank").cast("long").alias("rank"),
            F.col("doc").alias("doc_id"),
            "score",
            "n_terms_hit",
        )
    )


def bm25_score_stream(batch: DataFrame, text_col: str, id_col: str,
                      qterms_idf: DataFrame, avgdl: float,
                      k1: float = BM25_K1, b: float = BM25_B,
                      round_to: int = 4) -> DataFrame:
    """Stream-side BM25 scoring of ARRIVING documents against a fixed
    query-term model (ST18's core): ``qterms_idf`` is the static
    (qid, w, idf) table built once from the indexed corpus (bounded:
    |queries|·|terms| rows), ``avgdl`` the frozen corpus statistic.
    Each arriving doc explodes to tokens, joins the static model on
    the term (stream-static joins are append-safe), and aggregates
    per (doc, qid) — the ingest-side "which eval prompts does this
    new document answer?" screen. Works identically on a batch frame
    (the batch-parity test harness contract, streaming/ops.py).
    """
    toks = batch.select(
        F.col(id_col).alias("doc"), text_col
    ).select(
        "doc",
        F.posexplode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("pos", "w"),
    )
    tf = toks.groupBy("doc", "w").agg(
        F.count(F.lit(1)).cast("double").alias("tf"),
    )
    dl = toks.groupBy("doc").agg(F.count(F.lit(1)).cast("double").alias("dl"))
    joined = (
        tf.join(F.broadcast(qterms_idf), "w")
        .join(dl, "doc")
        .select(
            "doc", "qid",
            rnd(
                F.col("idf")
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
                ),
                8,
            ).alias("contrib"),
        )
    )
    return joined.groupBy("doc", "qid").agg(
        rnd(F.sum("contrib"), round_to).alias("score"),
        F.count(F.lit(1)).alias("n_terms_hit"),
    ).select(
        F.col("doc").alias(id_col),
        F.col("qid").alias("query_id"),
        "score",
        "n_terms_hit",
    )
