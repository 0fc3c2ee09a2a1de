"""Lexical retrieval over the documents table (engine extension).

BM25 top-k (Robertson & Spärck Jones probabilistic relevance framework —
the Okapi BM25 formula, public) for retrieval-shaped data selection: rank
corpus documents against a small fixed query set, e.g. to pull
domain-relevant training data or to audit what a benchmark query would
retrieve from the corpus before training.

Scale shape (the part that matters at 100 TB):

- The query term set is tiny by definition → it broadcasts, and the corpus
  token stream is FILTERED to query-term hits map-side before any shuffle.
  The only full-corpus aggregates are two scalars (N, avgdl) from a
  map-only pass over doc lengths; everything downstream operates on the
  hit stream (≪ corpus).
- No per-(doc, term) tf table over the whole vocabulary is ever built —
  building one first (the textbook formulation) shuffles every token of
  the corpus for a filter that discards almost all of them, the same trap
  `contamination_pairs` documents.
- All math is codegen built-ins; scores are rounded to 4 decimals so an
  independent engine lands on identical ranks (same contract as the
  logprob operators).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .textstats import words


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    id_col: str,
    text_col: str,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-k per query.

    score(q, d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))

    ``queries`` is a literal list of (query_id, query_text) — it becomes a
    broadcast of DISTINCT (query_id, term) rows.  Returns
    (query_id, doc_id, score, rank) with rank 1..k ordered by
    (rounded score desc, doc_id) — the rounded score drives the ORDER as
    well as the output so two engines cannot disagree at a tie boundary.

    Plan: one map-only pass computes per-doc length; a scalar aggregate
    (N, avgdl) broadcasts via the 1-row BroadcastNestedLoopJoin pattern
    (see PLANS.md — scalar broadcast, not a cartesian); the token explode
    is filtered by the broadcast query-term set BEFORE the (doc, term) tf
    aggregate, so only hits shuffle; df(t) is a second tiny aggregate of
    the same hit stream.  k is enforced with a row_number window
    partitioned by query_id — #queries partitions of #matching docs, never
    a global sort."""
    spark = docs.sparkSession
    q_terms = (
        spark.createDataFrame(queries, ["query_id", "_qtext"])
        .select("query_id", F.explode(F.split("_qtext", " ")).alias("term"))
        .distinct()
    )
    staged = docs.select(
        F.col(id_col).alias("doc_id"), words(F.col(text_col)).alias("_w")
    ).select("doc_id", "_w", F.size("_w").cast("double").alias("dl"))
    scalars = staged.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    # hits: corpus tokens filtered to query terms map-side (semi-join on the
    # broadcast term set), THEN tf-aggregated — only hits ever shuffle
    terms = F.broadcast(q_terms.select("term").distinct())
    tf = (
        staged.select("doc_id", "dl", F.explode("_w").alias("term"))
        .join(terms, on="term", how="left_semi")
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    contrib = (
        tf.join(F.broadcast(dfreq), on="term")
        .crossJoin(F.broadcast(scalars))
        .join(F.broadcast(q_terms), on="term")
        .select(
            "query_id",
            "doc_id",
            (
                idf
                * (F.col("tf") * (k1 + 1.0))
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
            ).alias("_c"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("_c"), 4).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )
