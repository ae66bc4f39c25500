"""Chunk-retrieval (operators/rag.py, pipe9) cross-checks.

The pipe9 oracle restates the retrieval in DuckDB; these tests add the
independent plain-Python leg (test_reference_impls pattern): a dict-and-
loop reimplementation of the trigram embedding and the brute top-k must
reproduce the Spark results exactly, and the serve plan must broadcast
the query side (no shuffle of the corpus for a 3-query serve).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"
DIM = 16


def _py_embed(chunk: str, dim: int = DIM):
    """Plain-Python twin of embed_chunks_trigram: no numpy, no SQL."""
    v = [0] * dim
    for i in range(len(chunk) - 2):
        code = ord(chunk[i]) * 961 + ord(chunk[i + 1]) * 31 + ord(chunk[i + 2])
        v[code % dim] += 1
    return v, math.sqrt(float(sum(x * x for x in v)))


def test_trigram_embedding_vs_python_impl(spark):
    from ago_sisdb_spark.inventory import _t
    from ago_sisdb_spark.operators import dedup, rag

    docs = _t(spark, SF, "documents").limit(50)
    chunks = dedup.cdc_chunk_docs(docs, "doc_id", "text")
    got = {
        (r["doc_id"], r["chunk_idx"]): (list(r["vec"]), r["norm"])
        for r in rag.embed_chunks_trigram(chunks).collect()
    }
    raw = {(r["doc_id"], r["chunk_idx"]): r["chunk"] for r in chunks.collect()}
    expected = {
        key: _py_embed(c) for key, c in raw.items() if c and len(c) >= 8
    }
    assert set(got) == set(expected)
    for key, (v, n) in expected.items():
        assert got[key][0] == v, key
        assert got[key][1] == n, key  # bit-exact: sqrt of an exact integer


def test_topk_vs_python_bruteforce(spark):
    from ago_sisdb_spark.inventory import _t
    from ago_sisdb_spark.operators import dedup, rag

    docs = _t(spark, SF, "documents").where(F.col("doc_id") < 80)
    emb_df = rag.embed_chunks_trigram(dedup.cdc_chunk_docs(docs, "doc_id", "text"))
    emb = {
        (r["doc_id"], r["chunk_idx"]): (list(r["vec"]), r["norm"])
        for r in emb_df.collect()
    }
    queries = emb_df.where((F.col("doc_id").isin(1, 11)) & (F.col("chunk_idx") == 0))
    got = [
        (r["q_doc"], r["doc_id"], r["chunk_idx"], r["score"], r["rank"])
        for r in rag.chunk_topk(emb_df, queries, k=5)
        .orderBy("q_doc", "rank")
        .collect()
    ]

    expected = []
    for qd in (1, 11):
        qv, qn = emb[(qd, 0)]
        cand = []
        for (d, ci), (v, n) in emb.items():
            if (d, ci) == (qd, 0):
                continue
            s = float(sum(a * b for a, b in zip(qv, v))) / (n * qn)
            cand.append((-s, d, ci))
        cand.sort()
        for rank, (neg_s, d, ci) in enumerate(cand[:5], start=1):
            expected.append((qd, d, ci, round(-neg_s, 6), rank))
    assert got == expected


def test_serve_plan_broadcasts_queries(spark):
    from ago_sisdb_spark.inventory import _t
    from ago_sisdb_spark.operators import dedup, rag

    docs = _t(spark, SF, "documents")
    emb = rag.embed_chunks_trigram(dedup.cdc_chunk_docs(docs, "doc_id", "text"))
    queries = emb.where((F.col("doc_id") == 1) & (F.col("chunk_idx") == 0))
    plan = (
        rag.chunk_topk(emb, queries)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_empty_query_set_refuses(spark):
    import pytest

    from ago_sisdb_spark.inventory import _t
    from ago_sisdb_spark.operators import dedup, rag

    docs = _t(spark, SF, "documents").limit(20)
    emb = rag.embed_chunks_trigram(dedup.cdc_chunk_docs(docs, "doc_id", "text"))
    with pytest.raises(ValueError, match="query set is empty"):
        rag.chunk_topk(emb, emb.where(F.col("doc_id") == -1))


def test_embedding_mass_properties(spark):
    """Structural invariants of the trigram embedding: sum(vec) equals the
    trigram count (len-2) and norm^2 equals the exact integer sum of
    squares — for every chunk, not a sampled few."""
    from ago_sisdb_spark.inventory import _t
    from ago_sisdb_spark.operators import dedup, rag

    docs = _t(spark, SF, "documents").limit(100)
    chunks = dedup.cdc_chunk_docs(docs, "doc_id", "text")
    lens = {
        (r["doc_id"], r["chunk_idx"]): len(r["chunk"])
        for r in chunks.collect()
    }
    for r in rag.embed_chunks_trigram(chunks).collect():
        v = list(r["vec"])
        assert sum(v) == lens[(r["doc_id"], r["chunk_idx"])] - 2
        assert abs(r["norm"] ** 2 - float(sum(x * x for x in v))) < 1e-9


def test_indexed_serve_matches_direct_and_never_scans_corpus(spark, tmp_path):
    """The persisted-index story: build on history, append a batch (no
    history re-chunking), serve from the index — results identical to the
    direct pipeline over the union, and the serve plan reads ONLY the
    index parquet (no documents scan)."""
    from ago_sisdb_spark.inventory import _t
    from ago_sisdb_spark.operators import dedup, rag

    docs = _t(spark, SF, "documents")
    hist = docs.where(F.col("doc_id") < 60)
    batch = docs.where((F.col("doc_id") >= 60) & (F.col("doc_id") < 90))
    path = str(tmp_path / "chunk_index")

    rag.build_chunk_index(hist, path)
    rag.append_chunk_index(batch, path)

    queries = rag.embed_chunks_trigram(
        dedup.cdc_chunk_docs(docs.where(F.col("doc_id") == 1), "doc_id", "text")
    ).where(F.col("chunk_idx") == 0)

    served = rag.chunk_topk_indexed(spark, path, queries, k=5)
    direct = rag.chunk_topk(
        rag.embed_chunks_trigram(
            dedup.cdc_chunk_docs(
                docs.where(F.col("doc_id") < 90), "doc_id", "text"
            )
        ),
        queries,
        k=5,
    )
    assert sorted(map(tuple, served.collect()), key=lambda t: (t[0], t[4])) == sorted(
        map(tuple, direct.collect()), key=lambda t: (t[0], t[4])
    )

    # the serve plan touches documents ZERO times: the query side is
    # pre-materialized (chunk_topk checkpoints it) and the corpus side is
    # a parquet scan whose ReadSchema carries the embedded columns — the
    # index, never re-chunked history.  (FileScan's toString truncates
    # location paths, so match the schema; AdaptiveSparkPlan's toString
    # appends an "== Initial Plan ==" copy — count in the final section)
    plan = served._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "vec:array<bigint>" in final
    assert final.count("documents.parquet") == 0


def test_embedding_fuzz_unicode_vs_python_impl(spark):
    """Hypothesis-style fuzz (fixed seed corpus for determinism): arbitrary
    unicode chunks — CJK, emoji, combining marks, whitespace runs — must
    embed identically to the plain-Python twin (ord() and DuckDB ascii()
    both speak code points; a bytes-based implementation would diverge
    here)."""
    from ago_sisdb_spark.operators import rag

    import random

    rng = random.Random(20260815)
    alphabets = [
        "abcdefgh ijklmnop",
        "αβγδεζηθ ικλμνξοπ",
        "一二三四五六七八九十",
        "🙂🙃😀😁😂🤣",
        "áêĩ",  # combining marks
        "\t\n  mixed \t ws",
    ]
    rows = []
    for i in range(200):
        alpha = alphabets[i % len(alphabets)]
        n = rng.randint(8, 40)
        rows.append((i, 0, "".join(rng.choice(alpha) for _ in range(n))))
    chunks = spark.createDataFrame(
        rows, "doc_id bigint, chunk_idx bigint, chunk string"
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): (list(r["vec"]), r["norm"])
        for r in rag.embed_chunks_trigram(chunks).collect()
    }
    assert len(got) == 200
    for did, ci, c in rows:
        v, n = _py_embed(c)
        assert got[(did, ci)] == (v, n), (did, c)


def test_append_refuses_mismatched_params(spark, tmp_path):
    """A dim/min_len mismatch on append would NULL-pad every zip_with dot
    and silently sink those chunks in every top-k — it must refuse."""
    import pytest

    from ago_sisdb_spark.inventory import _t
    from ago_sisdb_spark.operators import rag

    docs = _t(spark, SF, "documents").limit(30)
    path = str(tmp_path / "idx")
    rag.build_chunk_index(docs, path)
    with pytest.raises(ValueError, match="differ from the index build"):
        rag.append_chunk_index(docs, path, dim=128)
    with pytest.raises(ValueError, match="no readable _meta"):
        rag.append_chunk_index(docs, str(tmp_path / "nonexistent"))


def test_fused_chunk_embed_matches_two_stage(spark):
    """chunk_embed_trigram (one mapInPandas pass, r8 ingest hot path) must
    be row-identical to embed_chunks_trigram(cdc_chunk_docs(...)) — ids,
    chunk indices, vectors, norms."""
    from ago_sisdb_spark.operators import dedup, rag

    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 20),
        (2, "short"),                       # < min_len once chunked
        (3, None),                          # null text dropped
        (4, "ABC def GHI jkl " * 40),       # case-folding parity
        (5, "x" * 7),                       # boundary: len 7 < min_len 8
        (6, "y" * 8),                       # boundary: exactly min_len
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    two = {
        (r.doc_id, r.chunk_idx): (tuple(r.vec), r.norm)
        for r in rag.embed_chunks_trigram(
            dedup.cdc_chunk_docs(docs, "doc_id", "text")
        ).collect()
    }
    one = {
        (r.doc_id, r.chunk_idx): (tuple(r.vec), r.norm)
        for r in rag.chunk_embed_trigram(docs, "doc_id", "text").collect()
    }
    assert one == two and len(one) > 0
