"""Full-text relevance search (BM25) over a document corpus.

The reference exposes substring/field-predicate search over string fields
(sisdb_fmap_get.c search DSL); a training-data corpus additionally needs
ranked relevance retrieval — e.g. pulling the documents most relevant to a
benchmark prompt for decontamination review, or topic-targeted sampling.
This module provides the classic Okapi BM25 ranking as pure DataFrame ops:

- ad-hoc query (``bm25_topk``): the bounded query-term set folds into the
  token scan as a literal ``isin`` filter BEFORE any aggregation, so only
  matching tokens ever reach a shuffle; doc lengths are a narrow map-side
  ``size(tokenize(text))`` projection with no shuffle at all.  Document
  frequencies come from the filtered postings (a term's posting list
  already contains every doc that term appears in).
- offline index (``build_text_index`` → ``bm25_topk_indexed``): the full
  ``tf(doc, term)`` postings table is built once (explode + groupBy),
  repartitioned by term, and persisted; serving joins broadcast query
  terms against the parquet posting lists — no corpus scan in the plan.

At 100 TB the postings table is materialized once (bucketed by term) and
each query touches only its terms' posting lists — the same asymmetric
broadcast shape as n1_knn_bruteforce's probe join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ago_sisdb_spark.materialize import materialize as _materialize

__all__ = [
    "tokenize",
    "bm25_topk",
    "build_text_index",
    "load_text_index",
    "bm25_topk_indexed",
]


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

    Plan shape (r8): the query-term set is bounded, so it is folded into
    the scan as an ``isin`` literal filter BEFORE the postings aggregation
    — only matching tokens ever reach a shuffle.  (The r7 form aggregated
    the FULL corpus-wide tf(doc, term) and broadcast-joined the query
    terms above it; Catalyst cannot push a join below an aggregation, so
    the serve pass paid a corpus-scale shuffle for a query-bounded
    result.)  Doc lengths come from a narrow map-side projection
    ``size(tokenize(text))`` — no shuffle at all — and are checkpointed as
    the doc-cardinality collapse table both stats and scoring read.
    Two sequential corpus scans, zero corpus-scale shuffles.
    """
    spark = docs.sparkSession
    all_terms = sorted({t for _, terms in queries for t in set(terms)})
    dl = docs.select(
        F.col(id_col).alias("doc"),
        F.size(tokenize(F.col(text_col))).cast("bigint").alias("dl"),
    )
    dl = _materialize(dl)
    stats = dl.agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl"))
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(tokenize(F.col(text_col))).alias("term"),
    )
    tf = (
        toks.where(F.col("term").isin(all_terms))
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )

    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in queries for t in set(terms)],
        "query_id long, term string",
    )
    return _bm25_rank(tf, dl, stats, qterms, k, k1, b)


def _index_tables(
    docs: DataFrame, id_col: str, text_col: str, materialize: bool = True
):
    """The three inverted-index tables: postings tf(doc, term), doc
    lengths, and the 1-row (N, avgdl) stats.

    Pass accounting (the naive four-branch plan re-tokenized the corpus
    FOUR times — 4 documents scans, 0 reused exchanges, the r7
    two-consumer trap): postings stay LAZY — they are corpus-scale, and
    block-storing them is not a 100 TB shape (the OFFLINE path persists
    them to parquet via ``build_text_index`` instead).  The
    materialization point is the DOC-LENGTH table — one narrow row per
    doc, derived as Σ tf — so ``stats`` and every dl consumer read blocks
    instead of re-running the tokenize.  Each downstream consumer of
    ``tf`` then costs exactly one deliberate corpus pass (tfidf: 4 — a
    documented small-state N-pass design, like t12).  ``bm25_topk`` no
    longer uses these tables (r8): its query-bounded serve filters terms
    below the aggregation instead — see its docstring."""
    toks = docs.select(
        F.col(id_col).alias("doc"), F.explode(tokenize(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy("doc").agg(F.sum("tf").alias("dl"))
    if materialize:
        dl = _materialize(dl)
    stats = dl.agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl"))
    return tf, dl, stats


def _bm25_rank(tf, dl, stats, qterms, k: int, k1: float, b: float) -> DataFrame:
    # broadcast the tiny query-term table; only matching posting lists
    # survive this join.  The MATCHED postings (query-bounded, tiny) are
    # materialized so dfreq and the scoring join don't each re-run the
    # corpus tokenize — this is the bm25 path's one deliberate corpus
    # pass besides the doc-length build
    post = tf.join(F.broadcast(qterms), "term").localCheckpoint(eager=True)
    # df per term from the filtered postings (one row per (doc, term))
    dfreq = (
        post.select("term", "doc")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    # the matched-postings side is query-bounded — broadcast IT into the
    # doc-length join (r8): unhinted, the planner may build the locally
    # smaller doc-length table, which is corpus-scale in production
    scored = (
        F.broadcast(post.join(F.broadcast(dfreq), "term"))
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


def text_index_path(warehouse_dir: str, sf_dir: str) -> str:
    """Stable on-disk location for a scale-factor's inverted index."""
    import os

    tag = sf_dir.rstrip("/").replace("/", "_").lstrip("_")
    return os.path.join(warehouse_dir, "text_index", tag)


def build_text_index(
    docs: DataFrame, id_col: str, text_col: str, path: str
) -> None:
    """The OFFLINE index job (same train/serve split as the IVF/PQ
    indexes): materialize postings / doc-length / corpus-stats parquet
    once; every query afterwards reads only its terms' posting lists.
    Postings are REPARTITIONED BY term before the write so each term's
    list lands contiguously — the parquet row-group pruning unit a
    term-lookup join wants at 100 TB (bucketed-table DDL is the
    warehouse-managed variant of the same layout).

    The corpus is tokenized exactly ONCE: doc lengths and stats derive by
    READING BACK the just-written postings parquet (cheap columnar scans
    of the index, not fresh corpus passes — the r7 dupscans fix applied
    to the build side).
    """
    import os

    tf, _dl, _stats = _index_tables(
        docs, id_col, text_col, materialize=False
    )
    tf.repartition(F.col("term")).write.mode("overwrite").parquet(
        os.path.join(path, "postings")
    )
    post_back = docs.sparkSession.read.parquet(os.path.join(path, "postings"))
    dl = post_back.groupBy("doc").agg(F.sum("tf").alias("dl"))
    dl.write.mode("overwrite").parquet(os.path.join(path, "doclen"))
    dl_back = docs.sparkSession.read.parquet(os.path.join(path, "doclen"))
    stats = dl_back.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    )
    stats.write.mode("overwrite").parquet(os.path.join(path, "stats"))


def load_text_index(spark: SparkSession, path: str):
    """(tf, dl, stats) read back from a materialized index; None if the
    index was never built."""
    import os

    from pyspark.errors import AnalysisException

    try:
        tf = spark.read.schema("doc bigint, term string, tf bigint").parquet(
            os.path.join(path, "postings")
        )
        dl = spark.read.schema("doc bigint, dl bigint").parquet(
            os.path.join(path, "doclen")
        )
        stats = spark.read.schema("n bigint, avgdl double").parquet(
            os.path.join(path, "stats")
        )
        return tf, dl, stats
    except AnalysisException:
        return None


def bm25_topk_indexed(
    spark: SparkSession,
    index,
    queries: list[tuple[int, list[str]]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 serving from a materialized index (``load_text_index``): the
    query plan contains NO corpus scan — just the broadcast query-term
    join against the postings parquet.  Identical scores to ``bm25_topk``
    (pinned by test_textsearch)."""
    tf, dl, stats = index
    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in queries for t in set(terms)],
        "query_id long, term string",
    )
    return _bm25_rank(tf, dl, stats, qterms, k, k1, b)


def tfidf_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, list[str]]],
    k: int = 10,
) -> DataFrame:
    """Top-``k`` documents per query under TF-IDF cosine similarity — the
    classic vector-space twin of ``bm25_topk`` (Salton's VSM; BM25 usually
    wins on ranking quality, TF-IDF vectors double as features for
    clustering/dedup, so both belong in the toolbox).

    w(d,t) = tf(d,t) · idf(t), idf = ln(1 + N/df(t));
    score(q,d) = Σ_t∈q w(d,t) · idf(t)  /  ‖d‖
    (query terms unweighted, document L2-normalized — the standard
    lnc.ltc-flavored asymmetric form).

    Same asymmetric shape as BM25: the query-term table broadcasts, ONLY
    matching posting lists join, but the document norm needs idf over ALL
    the doc's terms, so ‖d‖ comes from one additional vocabulary-scale
    pass (df per term broadcast back onto postings).  Scores rounded to
    6 dp; ties break by ascending doc id.
    """
    spark = docs.sparkSession
    tf, dl, stats = _index_tables(docs, id_col, text_col)
    # per-term document frequencies (vocabulary-bounded, narrow) are
    # materialized once; widf stays LAZY (corpus-postings-scale), so the
    # two widf consumers (norms, query join) are tfidf's two deliberate
    # corpus passes — plus dfreq's own build and the doc-length build: a
    # documented 4-pass small-state design
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    ).localCheckpoint(eager=True)
    n_docs = stats.select("n")
    widf = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc", "term",
            (F.col("tf") * F.log(F.lit(1.0) + F.col("n") / F.col("df"))).alias("w"),
            F.log(F.lit(1.0) + F.col("n") / F.col("df")).alias("idf"),
        )
    )
    norms = widf.groupBy("doc").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("dnorm")
    )
    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in queries for t in set(terms)],
        "query_id long, term string",
    )
    post = widf.join(F.broadcast(qterms), "term")
    # query-bounded dot products broadcast into the corpus-scale norms
    # join (r8, same build-side rule as _bm25_rank)
    scored = (
        F.broadcast(
            post.groupBy("query_id", "doc")
            .agg(F.sum(F.col("w") * F.col("idf")).alias("dp"))
        )
        .join(norms, "doc")
        .select(
            "query_id", "doc",
            F.round(F.col("dp") / F.col("dnorm"), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "doc", "rank", "score")
    )


def rrf_fuse(
    ranked: dict[str, DataFrame],
    keys: tuple[str, str] = ("query_id", "doc"),
    rank_col: str = "rank",
    k0: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of named per-query rankings (Cormack,
    Clarke & Buettcher, SIGIR 2009): the standard hybrid-retrieval merge
    used to combine sparse (BM25) and dense/second-stage rankers without
    score calibration —

        rrf(d) = Σ_r 1 / (k0 + rank_r(d)),   missing from list r → 0.

    Scale shape: the inputs are already per-query TOP-K lists (each
    bounded by |queries|·k rows however large the corpus), so the fusion
    is a full-outer join of tiny frames plus one partitioned window —
    nothing here ever touches corpus-scale data; the heavy lifting
    stays in the upstream rankers.

    Cross-engine determinism: each 1/(k0+rank) term is one correctly-
    rounded IEEE division of exact integers, and the fused score folds
    the named lists' terms in dict order — a FIXED expression tree, so
    the doubles hash bit-identically against the SQL oracle (see
    working-notes: float determinism; only order-dependent row
    reductions diverge).

    Returns (query_id, doc, fused_rank, rrf_score, rank_<name>...),
    top-``k`` per query by descending score, doc-id ascending tie-break.
    """
    assert ranked, "need at least one ranking"
    qid, doc = keys
    slim = [
        df.select(qid, doc, F.col(rank_col).alias(f"rank_{name}"))
        for name, df in ranked.items()
    ]
    fused = slim[0]
    for nxt in slim[1:]:
        fused = fused.join(nxt, [qid, doc], "full_outer")
    score = None
    for name in ranked:
        term = F.coalesce(
            F.lit(1).cast("double")
            / (F.lit(k0) + F.col(f"rank_{name}")).cast("double"),
            F.lit(0.0),
        )
        score = term if score is None else score + term
    fused = fused.withColumn("rrf_score", score)
    w = Window.partitionBy(qid).orderBy(F.desc("rrf_score"), F.asc(doc))
    return (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("fused_rank") <= k)
        .select(
            qid, doc, "fused_rank", "rrf_score",
            *[f"rank_{name}" for name in ranked],
        )
    )


def prf_bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, list[str]]],
    k: int = 10,
    feedback_k: int = 5,
    expand_terms: int = 3,
) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (RM3-lite, Lavrenko &
    Croft's relevance-model family as used by Anserini's RM3 default):
    run BM25, assume the top ``feedback_k`` docs per query are relevant,
    mine their ``expand_terms`` most frequent NEW terms, append them to
    the query, and re-run BM25 with the expanded term set.

    Scale shape: stage 1 is the audited query-bounded bm25_topk plan;
    the feedback set (|queries|·feedback_k ids) joins back to fetch only
    its own texts (tiny side broadcast into the corpus scan — the
    batch-vs-corpus artifact rule), so term mining tokenizes
    feedback_k·|queries| documents, not the corpus.  The mined terms are
    then COLLECTED: a deliberately driver-sized, query-bounded artifact
    — stage 2 must fold its term set into the token scan as an ``isin``
    literal BELOW the aggregation (the r8 n5 lesson; Catalyst cannot
    push a data-dependent join below a groupBy, so a join-driven term
    set would re-pay a corpus-wide shuffle).

    Expansion terms rank by (feedback tf desc, term asc) — integer
    counts, deterministic cross-engine.  Returns stage-2's
    (query_id, doc, rank, score)."""
    spark = docs.sparkSession
    # doc lengths and (N, avgdl) are TERM-INDEPENDENT — build them once
    # and share across both stages (a second bm25_topk call would re-run
    # the corpus doc-length pass; the r7 dupscan lesson)
    dl = _materialize(
        docs.select(
            F.col(id_col).alias("doc"),
            F.size(tokenize(F.col(text_col))).cast("bigint").alias("dl"),
        )
    )
    stats = dl.agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl"))
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(tokenize(F.col(text_col))).alias("term"),
    )

    def stage(qs: list[tuple[int, list[str]]], topk: int) -> DataFrame:
        terms = sorted({t for _, ts in qs for t in set(ts)})
        tf = (
            toks.where(F.col("term").isin(terms))
            .groupBy("doc", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        qt = spark.createDataFrame(
            [(qid, t) for qid, ts in qs for t in set(ts)],
            "query_id long, term string",
        )
        return _bm25_rank(tf, dl, stats, qt, topk, 1.2, 0.75)

    fb = stage(queries, feedback_k)
    fb_ids = fb.select("query_id", "doc")
    fb_docs = docs.select(
        F.col(id_col).alias("doc"), F.col(text_col).alias("__t")
    ).join(F.broadcast(fb_ids), "doc")
    fb_counts = (
        fb_docs.select("query_id", F.explode(tokenize(F.col("__t"))).alias("term"))
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in queries for t in set(terms)],
        "query_id long, term string",
    )
    fresh = fb_counts.join(F.broadcast(qterms), ["query_id", "term"], "left_anti")
    w = Window.partitionBy("query_id").orderBy(F.desc("cnt"), F.asc("term"))
    picked = (
        fresh.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= expand_terms)
        .select("query_id", "term")
        .collect()  # query-bounded artifact (≤ |queries|·expand_terms rows)
    )
    expansion: dict[int, list[str]] = {}
    for r in picked:
        expansion.setdefault(r["query_id"], []).append(r["term"])
    expanded = [
        (qid, sorted(set(terms) | set(expansion.get(qid, []))))
        for qid, terms in queries
    ]
    return stage(expanded, k)


def blend_fuse(
    ranked: dict[str, DataFrame],
    alpha: float = 0.5,
    keys: tuple[str, str] = ("query_id", "doc"),
    score_col: str = "score",
    k: int = 10,
) -> DataFrame:
    """Convex score-interpolation fusion of TWO named rankings — the
    calibrated alternative to rrf_fuse when raw scores are worth
    trusting: min-max normalize each ranker's scores WITHIN each query
    (so BM25's unbounded scale and cosine's [0,1] become comparable),
    then blend  s = α·norm_first + (1-α)·norm_second,  docs absent from
    a list contributing 0 from it.

    Same scale shape as rrf_fuse: inputs are per-query top-k lists
    (query-bounded however large the corpus), so normalization windows
    partition by query over ≤k rows and the join is tiny.  Determinism:
    upstream scores are round-6 (identical cross-engine), min/max over
    them are exact selections, and the normalized blend is a FIXED tree
    of correctly-rounded IEEE ops — hash-identical vs the SQL twin.  A
    single-document list normalizes to 1.0 (max==min guard).

    Returns (query_id, doc, fused_rank, blend_score, score_<name>...),
    top-``k`` per query, doc-ascending tie-break."""
    assert len(ranked) == 2, "blend_fuse is a two-ranker fusion"
    qid, doc = keys
    (na, a), (nb, b) = ranked.items()

    def norm(df: DataFrame, name: str) -> DataFrame:
        w = Window.partitionBy(qid)
        s = F.col(score_col)
        lo, hi = F.min(s).over(w), F.max(s).over(w)
        nrm = F.when(hi == lo, F.lit(1.0)).otherwise((s - lo) / (hi - lo))
        return df.select(
            qid, doc,
            s.alias(f"score_{name}"),
            nrm.alias(f"__n_{name}"),
        )

    j = norm(a, na).join(norm(b, nb), [qid, doc], "full_outer")
    blend = (
        F.lit(alpha) * F.coalesce(F.col(f"__n_{na}"), F.lit(0.0))
        + F.lit(1.0 - alpha) * F.coalesce(F.col(f"__n_{nb}"), F.lit(0.0))
    )
    j = j.withColumn("blend_score", blend)
    w = Window.partitionBy(qid).orderBy(F.desc("blend_score"), F.asc(doc))
    return (
        j.withColumn("fused_rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("fused_rank") <= k)
        .select(qid, doc, "fused_rank", "blend_score",
                f"score_{na}", f"score_{nb}")
    )
