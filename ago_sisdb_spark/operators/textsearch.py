"""Full-text relevance search (BM25) over a document corpus.

The reference exposes substring/field-predicate search over string fields
(sisdb_fmap_get.c search DSL); a training-data corpus additionally needs
ranked relevance retrieval — e.g. pulling the documents most relevant to a
benchmark prompt for decontamination review, or topic-targeted sampling.
This module provides the classic Okapi BM25 ranking as pure DataFrame ops:

- index build: one explode + two groupBys (postings ``tf(doc, term)`` and
  doc lengths) — the standard inverted-index layout, partitioned by term;
- scoring: the query-term table is tiny and BROADCAST, so only postings
  for the queried terms flow into the score aggregation.  Document
  frequencies are computed from those filtered postings (a term's posting
  list already contains every doc that term appears in), so nothing
  corpus-sized is shuffled after the index build.

At 100 TB the postings table is materialized once (bucketed by term) and
each query touches only its terms' posting lists — the same asymmetric
broadcast shape as n1_knn_bruteforce's probe join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["tokenize", "bm25_topk"]


def tokenize(text: Column) -> Column:
    """Whitespace tokenization, lowercased — matches the t1/t7 convention
    (split on runs of whitespace after trim)."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, list[str]]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents per query under Okapi BM25.

    ``queries`` is ``[(query_id, [term, ...]), ...]``.  Returns
    ``(query_id, doc, rank, score)`` with ``score`` rounded to 6 places and
    rank ties broken by ascending doc id (deterministic output set).

    idf uses the Lucene-style non-negative form
    ``ln(1 + (N - df + 0.5) / (df + 0.5))``.
    """
    spark = docs.sparkSession
    toks = docs.select(
        F.col(id_col).alias("doc"), F.explode(tokenize(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    )

    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in queries for t in set(terms)],
        "query_id long, term string",
    )
    # broadcast the tiny query-term table; only matching posting lists
    # survive this join
    post = tf.join(F.broadcast(qterms), "term")
    # df per term from the filtered postings (one row per (doc, term))
    dfreq = (
        post.select("term", "doc")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    scored = (
        post.join(F.broadcast(dfreq), "term")
        .join(dl, "doc")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
            ).alias("part_score"),
        )
        .groupBy("query_id", "doc")
        .agg(F.round(F.sum("part_score"), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "doc", "rank", "score")
    )
