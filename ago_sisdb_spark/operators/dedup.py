"""Deduplication operators for large-scale training-data pipelines
(SURVEY §2.11; no reference analogue — the reference's ANN module is dead
code, `src/core/ai/sis_ai_ann.h:1-80`).

Scale design (100 TB corpus):

- exact:   hash-groupBy on a content digest — one shuffle of (digest, id),
           never the documents themselves.
- minhash: shingle → k independent min-hashes (one pass, no shuffle) →
           band → exploded (band, band-hash) bucket join — candidate pairs
           only ever materialize within a bucket, the classic LSH bound.
- simhash: 64-bit fingerprint per doc via weighted token hash bits; near-dups
           = fingerprints at small Hamming distance, found by 4-way band
           partitioning (each band exact-matched by groupBy).

Everything below is built-in expressions (xxhash64, transform, aggregate,
explode) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^31-1: keeps a*h products inside int64 (Spark 4 runs ANSI mode — long
# overflow raises instead of wrapping).
_MERSENNE = (1 << 31) - 1


def content_digest(text: Column) -> Column:
    """Stable content digest for exact dedup (md5 here; xxhash64 is faster
    but not portable to the SQL oracle)."""
    return F.md5(text)


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical documents: digest, group size, keeper id."""
    return (
        df.select(F.col(id_col), content_digest(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


def word_shingles(text: Column, k: int) -> Column:
    """Distinct k-word shingles of a whitespace-tokenized text column."""
    words = F.split(text, r"\s+")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingle = lambda i: F.array_join(F.slice(words, i + 1, k), " ")  # noqa: E731
    return F.array_distinct(
        F.when(n >= k, F.transform(idx, shingle)).otherwise(F.array(words[0]))
    )


def minhash_signature(shingles: Column, num_hashes: int, seed: int = 7) -> Column:
    """MinHash signature: for each of ``num_hashes`` permutations
    h_i(x) = (a_i * xxhash64(x) + b_i) mod p, take the min over shingles.

    One expression tree per hash — evaluated in a single codegen'd pass over
    the shingle array; no shuffle, no UDF.
    """
    import random

    rnd = random.Random(seed)

    def perm_hash(a: int, b: int):
        # single-arg closure: pyspark derives lambda arity from the signature
        return lambda s: (
            (F.lit(a) * (F.abs(F.xxhash64(s)) % F.lit(_MERSENNE)) + F.lit(b))
            % F.lit(_MERSENNE)
        )

    sigs = []
    for _ in range(num_hashes):
        a = rnd.randrange(1, _MERSENNE)
        b = rnd.randrange(0, _MERSENNE)
        sigs.append(F.array_min(F.transform(shingles, perm_hash(a, b))))
    return F.array(*sigs)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH.

    rows_per_band = num_hashes // bands; docs sharing any band bucket become
    a candidate pair.  Returns (id_a, id_b, n_shared_bands); downstream
    verifies with exact Jaccard (``ngram_jaccard_pairs``) on candidates only.
    """
    rows = num_hashes // bands
    sig = minhash_signature(word_shingles(F.col(text_col), shingle_k), num_hashes)
    banded = df.select(F.col(id_col).alias("doc"), sig.alias("sig")).select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(",", F.slice("sig", b * rows + 1, rows)), b
                ),
            )
        ).alias("band", "bucket"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .groupBy(
            F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def simhash64(text: Column) -> Column:
    """64-bit SimHash over whitespace tokens.

    For each bit position, sum +1/-1 token votes (token hash bit set → +1);
    fingerprint bit = sign of the sum.  Pure array expressions.
    """
    tokens = F.split(text, r"\s+")
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))

    def bit_vote(i: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_votes = [
        F.aggregate(hashes, F.lit(0), bit_vote(i)) for i in range(64)
    ]
    fp = F.lit(0).cast("long")
    for i, v in enumerate(bit_votes):
        fp = fp.bitwiseOR(
            F.when(v > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        )
    return fp


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs above threshold.

    Explode distinct shingles → self-equi-join on shingle (the shuffle key)
    → |∩| per pair → |A∪B| = |A|+|B|−|∩|.  The equi-join means only docs
    *sharing a shingle* ever pair up — no O(n²) crossjoin.  At corpus scale,
    cap pair fan-out by dropping ultra-common shingles (stop-shingle filter)
    before the join.
    """
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
    ).distinct()
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc").alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("id_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
