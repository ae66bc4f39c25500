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


def test_top_terms_per_group_exact_and_deterministic(spark):
    """Controlled corpus: known counts, tie-break lexicographic, k cap."""
    from pyspark.sql import functions as F  # noqa: F401

    from ago_sisdb_spark.operators.text import top_terms_per_group

    rows = [
        (1, "en", "apple apple banana cherry"),
        (2, "en", "apple banana banana date"),
        (3, "fr", "un un deux"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = top_terms_per_group(docs, "lang", "text", k=3)
    en = [(r.rank, r.term, r.n) for r in sorted(
        out.where(out.grp == "en").collect(), key=lambda r: r.rank)]
    # apple=3, banana=3 (tie → lexicographic: apple first), cherry/date=1 (tie → cherry)
    assert en == [(1, "apple", 3), (2, "banana", 3), (3, "cherry", 1)]
    fr = [(r.rank, r.term, r.n) for r in sorted(
        out.where(out.grp == "fr").collect(), key=lambda r: r.rank)]
    assert fr == [(1, "un", 2), (2, "deux", 1)]
    # min_count filter
    out2 = top_terms_per_group(docs, "lang", "text", k=3, min_count=2)
    assert {r.term for r in out2.where(out2.grp == "en").collect()} == {"apple", "banana"}


def test_flag_blocked_hosts_suffix_semantics(spark):
    """Planted docs: exact match, subdomain suffix match, non-match that
    merely CONTAINS a blocked string (evil-h1.example.com.attacker.net),
    and URL-free text."""
    from pyspark.sql import functions as F

    from ago_sisdb_spark.operators.text import flag_blocked_hosts

    rows = [
        (1, "go to http://h1.example.com/a now"),          # exact
        (2, "see https://deep.sub.h1.example.com/x"),      # subdomain
        (3, "https://h1.example.com.attacker.net/phish"),  # NOT a match
        (4, "http://keep.example.org/fine"),               # other domain
        (5, "no urls at all here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r.blocked
        for r in docs.select(
            "doc_id",
            flag_blocked_hosts(F.col("text"), ["h1.example.com"]).alias("blocked"),
        ).collect()
    }
    assert out == {1: True, 2: True, 3: False, 4: False, 5: False}


def test_indexed_bm25_matches_inline(spark, tmp_path):
    """Serving from the materialized index must reproduce the inline
    scores exactly — and its plan must not rescan the corpus."""
    from ago_sisdb_spark.operators import textsearch

    rows = [(i, f"spark shuffle join {'index ' * (i % 4)}scan") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    queries = [(1, ["index", "scan"]), (2, ["shuffle"])]
    inline = textsearch.bm25_topk(docs, "doc_id", "text", queries, k=5).collect()
    path = str(tmp_path / "tidx")
    textsearch.build_text_index(docs, "doc_id", "text", path)
    idx = textsearch.load_text_index(spark, path)
    assert idx is not None
    served = textsearch.bm25_topk_indexed(spark, idx, queries, k=5)
    assert sorted(map(tuple, served.collect())) == sorted(map(tuple, inline))
    files = served.inputFiles()
    assert files and all("tidx" in f for f in files)  # only the index parquet


def test_load_text_index_missing_returns_none(spark, tmp_path):
    from ago_sisdb_spark.operators import textsearch

    assert textsearch.load_text_index(spark, str(tmp_path / "nope")) is None


def test_tfidf_ranks_rarer_match_higher(spark):
    """A query term appearing in fewer docs carries higher idf: the doc
    matching the rare term must outrank the doc matching the common one;
    a doc repeating the term outranks a single mention (tf factor), and
    pure-noise docs never appear."""
    from ago_sisdb_spark.operators import textsearch

    rows = [
        (1, "rare common filler filler"),
        (2, "common filler filler filler"),
        (3, "rare rare filler filler"),
    ] + [(10 + i, "common noise words only here") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = textsearch.tfidf_topk(docs, "doc_id", "text", [(0, ["rare"])], k=5)
    got = [(r.doc, r.rank) for r in out.orderBy("rank").collect()]
    assert [d for d, _ in got] == [3, 1]  # tf(rare)=2 beats tf=1; others absent


def test_bm25_tokenizes_corpus_exactly_once(spark, sf_small):
    """The r7-continuation fix: the naive four-branch plan re-tokenized
    the corpus FOUR times (4 documents scans, 0 reused exchanges) because
    post/dfreq/dl/stats each re-executed the explode.  Now the two SMALL
    collapse points materialize (doc lengths; the query-matched postings)
    and everything downstream reads blocks: the corpus is tokenized
    exactly twice, at checkpoint time (postings themselves stay lazy —
    block-storing a corpus-scale table is not a 100 TB shape), and the
    executed serve plan contains ZERO corpus scans or explodes."""
    import pyspark.sql.functions as F

    from ago_sisdb_spark.operators import textsearch

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    out = textsearch.bm25_topk(
        docs, "doc_id", "text", [(0, ["data", "value"])], k=5
    )
    out.collect()
    plan = (
        out._jdf.queryExecution().executedPlan().toString()
    ).split("== Initial Plan ==")[0]
    assert plan.count("documents.parquet") == 0
    assert plan.count("Generate") == 0  # no explode left in the serve plan
    assert out.count() > 0


def test_rrf_fuse_hand_computed(spark):
    """Planted two-ranker fusion: overlap, single-list docs, and the
    exact 1/(60+r) arithmetic.  q0: bm25=[d1,d2,d3], tfidf=[d2,d4].
    rrf(d2)=1/62+1/61 tops rrf(d1)=1/61; d3 and d4 tie-break by doc id
    (1/63 vs 1/62 — d4 actually beats d3)."""
    a = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (0, 3, 3)], "query_id long, doc long, rank long"
    )
    b = spark.createDataFrame(
        [(0, 2, 1), (0, 4, 2)], "query_id long, doc long, rank long"
    )
    rows = textsearch.rrf_fuse({"bm25": a, "tfidf": b}).collect()
    got = [(r["doc"], r["fused_rank"], r["rrf_score"]) for r in rows]
    exp = [
        (2, 1, 1 / 62 + 1 / 61),
        (1, 2, 1 / 61),
        (4, 3, 1 / 62),
        (3, 4, 1 / 63),
    ]
    assert sorted(got, key=lambda t: t[1]) == exp
    by_doc = {r["doc"]: (r["rank_bm25"], r["rank_tfidf"]) for r in rows}
    assert by_doc[2] == (2, 1) and by_doc[1] == (1, None) and by_doc[4] == (None, 2)


def test_rrf_fuse_multi_query_isolation(spark):
    """Rankings fuse per query: the same doc in two queries gets
    independent fused ranks."""
    a = spark.createDataFrame(
        [(0, 7, 1), (1, 7, 2), (1, 8, 1)], "query_id long, doc long, rank long"
    )
    b = spark.createDataFrame(
        [(1, 7, 1)], "query_id long, doc long, rank long"
    )
    rows = textsearch.rrf_fuse({"x": a, "y": b}, k=2).collect()
    got = {(r["query_id"], r["doc"]): r["fused_rank"] for r in rows}
    assert got == {(0, 7): 1, (1, 7): 1, (1, 8): 2}


def test_normalize_text_expr_hand_cases(spark):
    """NFC composes e+COMBINING ACUTE, zero-widths vanish BEFORE
    whitespace collapse, runs collapse to single spaces, ends trim;
    pure-ASCII rows take the fast path unchanged."""
    from ago_sisdb_spark.operators.text import normalize_text_expr

    rows = [
        (1, " Cafe\u0301\u200b  x\ty "),
        (2, "plain ascii  text"),
        (3, "\u200d\ufeff"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {
        r["id"]: r["n"]
        for r in df.select("id", normalize_text_expr(F.col("t")).alias("n")).collect()
    }
    assert got[1] == "Café x y"
    assert got[2] == "plain ascii text"
    assert got[3] == ""
    assert got[4] is None


def test_prf_expansion_retrieves_unmatched_doc(spark):
    """The RM3 point: a doc sharing NO original query term but rich in
    the feedback docs' companion vocabulary is invisible to plain BM25
    and retrieved after expansion."""
    rows = [
        (1, "alpha engine alpha engine turbine"),     # matches 'alpha'
        (2, "alpha engine turbine rotor"),            # matches 'alpha'
        (3, "engine turbine rotor blades spinning"),  # no 'alpha'!
        (4, "unrelated words about cooking pasta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    queries = [(0, ["alpha"])]

    plain = {r["doc"] for r in textsearch.bm25_topk(
        df, "doc_id", "text", queries, k=4).collect()}
    assert plain == {1, 2}

    expanded = {r["doc"] for r in textsearch.prf_bm25_topk(
        df, "doc_id", "text", queries, k=4, feedback_k=2, expand_terms=2
    ).collect()}
    # feedback docs {1,2} vote 'engine' (3x) and 'turbine' (2x) in;
    # doc 3 now matches, pasta doc still doesn't
    assert 3 in expanded and 4 not in expanded and {1, 2} <= expanded


def test_normalize_property_random_batch(spark):
    """Batched property test: on random unicode strings (combining marks,
    zero-widths, whitespace runs) the expression pipeline is IDEMPOTENT
    and agrees with the independent Python reference (re + unicodedata —
    no shared code with the operator)."""
    import random
    import re
    import unicodedata

    from ago_sisdb_spark.operators.text import normalize_text_expr

    def py_ref(t):
        x = re.sub("[​‌‍﻿]", "", t)
        x = unicodedata.normalize("NFC", x)
        return re.sub("[ \t\n\r\f\v]+", " ", x).strip(" ")

    pool = list("abc XY19\t\n") + ["́", "̀", "​", "‍",
                                   "﻿", "é", "ü", "中", "文"]
    rng = random.Random(99)
    texts = [
        (i, "".join(rng.choice(pool) for _ in range(rng.randint(0, 30))))
        for i in range(50)
    ]
    df = spark.createDataFrame(texts, "id long, t string")
    once = normalize_text_expr(F.col("t"))
    rows = df.select(
        "id", once.alias("n1"), normalize_text_expr(once).alias("n2")
    ).collect()
    by_id = {r["id"]: (r["n1"], r["n2"]) for r in rows}
    for i, t in texts:
        n1, n2 = by_id[i]
        assert n1 == py_ref(t), f"{t!r}"
        assert n2 == n1, f"not idempotent on {t!r}"


def test_blend_fuse_normalization_and_missing(spark):
    """Min-max normalization per query (max==min list -> 1.0); a doc
    absent from one list takes 0 from it; exact fixed-tree arithmetic."""
    a = spark.createDataFrame(
        [(0, 1, 10.0), (0, 2, 6.0), (0, 3, 2.0)],
        "query_id long, doc long, score double",
    )
    b = spark.createDataFrame(
        [(0, 2, 7.0), (0, 9, 7.0)], "query_id long, doc long, score double"
    )
    rows = textsearch.blend_fuse({"x": a, "y": b}, alpha=0.5).collect()
    got = {r["doc"]: r["blend_score"] for r in rows}
    # a-norms: d1=1.0, d2=0.5, d3=0.0 ; b max==min -> both 1.0
    assert got[2] == 0.5 * 0.5 + 0.5 * 1.0
    assert got[1] == 0.5 * 1.0
    assert got[9] == 0.5 * 1.0
    assert got[3] == 0.0
    order = [r["doc"] for r in sorted(rows, key=lambda r: r["fused_rank"])]
    assert order == [2, 1, 9, 3]  # 1 beats 9 on doc-id tie at 0.5
