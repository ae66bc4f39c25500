"""BM25 relevance search (operators/textsearch)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F  # noqa: F401

from ago_sisdb_spark.operators import textsearch


def _topk(spark, docs, queries, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = textsearch.bm25_topk(df, "doc_id", "text", queries, **kw)
    return out.collect()


def test_bm25_tf_orders_docs(spark):
    """More occurrences of the query term → higher score (same doc length)."""
    rows = _topk(
        spark,
        [
            (1, "apple apple apple pear pear pear pear pear"),
            (2, "apple pear pear pear pear pear pear pear"),
            (3, "plum plum plum plum plum plum plum plum"),
        ],
        [(0, ["apple"])],
    )
    ranked = [r.doc for r in sorted(rows, key=lambda r: r.rank)]
    assert ranked == [1, 2]  # doc 3 has no match and must be absent


def test_bm25_idf_favors_rare_terms(spark):
    """A doc matching the rare term outranks one matching the common term."""
    corpus = [(i, "common filler words here") for i in range(1, 9)]
    corpus += [(9, "rare common filler here"), (10, "common filler words here")]
    rows = _topk(spark, corpus, [(0, ["rare", "words"])], k=3)
    best = min(rows, key=lambda r: r.rank)
    assert best.doc == 9  # 'rare' df=1 beats 'words' df=9


def test_bm25_score_matches_closed_form(spark):
    """Single-doc, single-term corpus: score equals the textbook formula."""
    rows = _topk(spark, [(1, "x x y y")], [(0, ["x"])], k1=1.2, b=0.75)
    (r,) = rows
    # N=1, df=1, tf=2, dl=4, avgdl=4 → idf=ln(1+0.5/1.5); denom=2+1.2
    want = math.log(1 + 0.5 / 1.5) * (2 * 2.2) / (2 + 1.2)
    assert abs(r.score - round(want, 6)) < 1e-9


def test_bm25_rank_deterministic_tie_break(spark):
    """Identical docs tie on score; rank breaks by ascending doc id."""
    rows = _topk(
        spark,
        [(5, "a b c"), (2, "a b c"), (9, "a b c")],
        [(0, ["a"])],
    )
    ordered = [r.doc for r in sorted(rows, key=lambda r: r.rank)]
    assert ordered == [2, 5, 9]
    assert len({r.score for r in rows}) == 1
