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
    """Distinct k-word shingles as an array column (expression form).

    Prefer ``shingle_rows`` in pipelines — the exploded form is ~3× faster
    (array slice/join lambdas run interpreted) and its doc-key shuffle is
    reused by downstream per-doc aggregation.
    """
    words = F.split(text, r"\s+")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingle = lambda i: F.array_join(F.slice(words, i + 1, k), " ")  # noqa: E731
    return F.array_distinct(
        F.when(n >= k, F.transform(idx, shingle)).otherwise(F.array(words[0]))
    )


def shingle_rows(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(doc, shingle) rows: posexplode words, window-lead concat per doc.

    One shuffle on the doc key; per-doc groupBys downstream reuse the
    partitioning (Catalyst sees the co-partitioning, no second shuffle).
    Multiset semantics — apply ``.distinct()`` for set semantics (Jaccard);
    MinHash doesn't need it (min over multiset == min over set).
    Short documents (< k words) contribute their first word, matching
    ``word_shingles``.
    """
    from pyspark.sql import Window

    w = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.split(F.col(text_col), r"\s+")).alias("pos", "w"),
    )
    win = Window.partitionBy("doc").orderBy("pos")
    leads = [F.col("w")] + [F.lead("w", j).over(win) for j in range(1, k)]
    tail_ok = F.lead("w", k - 1).over(win).isNotNull() | (F.col("pos") == 0)
    return (
        w.select("doc", "pos", F.concat_ws(" ", *leads).alias("shingle"), tail_ok.alias("__ok"))
        .where(F.col("__ok"))
        .select("doc", "shingle")
    )


def _perm_params(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    import random

    rnd = random.Random(seed)
    return [
        (rnd.randrange(1, _MERSENNE), rnd.randrange(0, _MERSENNE))
        for _ in range(num_hashes)
    ]


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int,
    num_hashes: int,
    seed: int = 7,
) -> DataFrame:
    """(id, sig array) per document: h_i(x) = (a_i·xxhash64(x)+b_i) mod p,
    min over shingles.

    Shape matters for speed: explode shingles → hash each shingle ONCE →
    ``num_hashes`` cheap affine transforms → groupBy(id) min-agg.  The string
    hash is the expensive part; computing it inside per-permutation array
    lambdas re-hashes every shingle num_hashes times (measured 40× slower).
    The min aggregates combine map-side, so the shuffle carries one
    num_hashes-wide row per document.
    """
    return _minhash_mins(df, id_col, text_col, shingle_k, num_hashes, seed).select(
        "doc", F.array(*[f"s{i}" for i in range(num_hashes)]).alias("sig")
    )


def _minhash_mins(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int,
    num_hashes: int,
    seed: int = 7,
) -> DataFrame:
    """One min column per permutation (s0..sN-1) — the wide form both the
    signature array and the band hashes derive from."""
    base = shingle_rows(df, id_col, text_col, shingle_k).select(
        "doc", (F.abs(F.xxhash64("shingle")) % F.lit(_MERSENNE)).alias("h")
    )
    return base.groupBy("doc").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(_MERSENNE)).alias(
                f"s{i}"
            )
            for i, (a, b) in enumerate(_perm_params(num_hashes, seed))
        ]
    )


def cap_bucket_fanout(
    df: DataFrame,
    bucket_cols: list[str],
    max_bucket_size: int,
    log_drops: bool = False,
    name: str = "lsh",
) -> DataFrame:
    """Drop over-full LSH buckets before a self-join emits O(m²) candidates.

    A single degenerate bucket of m members (near-constant docs, zero
    vectors, boilerplate) emits m(m-1)/2 candidate pairs — at corpus scale
    one such bucket stalls the whole job.  Same rationale as the
    ``max_doc_freq`` stop-shingle filter in ``ngram_jaccard_pairs``: members
    of a bucket that large are not near-dup signal.  The ENTIRE bucket is
    dropped (keeping a subset would bias which pairs surface).

    Cost: a count window over the bucket keys — the window's hash
    partitioning is exactly the distribution the downstream self-join
    requires, so Catalyst adds no extra shuffle for the cap.

    ``log_drops=True`` runs one extra action to count what was dropped and
    logs it — diagnostics only; leave False in production plans.  Silent
    truncation would read as "covered everything", so callers that cap
    should surface the count in their own metrics when it matters.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*bucket_cols)
    sized = df.withColumn("__bsz", F.count(F.lit(1)).over(w))
    if log_drops:
        import logging

        dropped = sized.where(F.col("__bsz") > max_bucket_size)
        n_rows = dropped.count()
        n_buckets = dropped.select(*bucket_cols).distinct().count()
        logging.getLogger(__name__).warning(
            "%s: dropped %d over-cap buckets (> %d members, %d rows total)",
            name, n_buckets, max_bucket_size, n_rows,
        )
    return sized.where(F.col("__bsz") <= max_bucket_size).drop("__bsz")


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    max_bucket_size: int = 1000,
    log_drops: bool = False,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH.

    rows_per_band = num_hashes // bands; docs sharing any band bucket become
    a candidate pair.  Returns (id_a, id_b, n_shared_bands); downstream
    verifies with exact Jaccard (``ngram_jaccard_pairs``) on candidates only.

    ``max_bucket_size`` bounds the per-(band, bucket) self-join fan-out
    (``cap_bucket_fanout``); exact duplicates should be removed by
    ``exact_dedup_groups`` first — a bucket of 10⁶ byte-identical docs is
    the exact-dedup operator's job, not LSH's.
    """
    rows = num_hashes // bands
    mins = _minhash_mins(df, id_col, text_col, shingle_k, num_hashes)
    # band hash = multi-arg xxhash64 over that band's min columns directly —
    # no signature array, no concat_ws string building per band
    banded = mins.select(
        "doc",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(b), *[F.col(f"s{b * rows + j}") for j in range(rows)]
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    banded = cap_bucket_fanout(
        banded, ["band", "bucket"], max_bucket_size, log_drops, "minhash_lsh"
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


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash) — 64-bit SimHash over whitespace tokens.

    For each bit position, sum +1/-1 token votes (token hash bit set → +1);
    fingerprint bit = sign of the sum.  Explode → hash each token ONCE →
    64 conditional-sum aggregates (map-side combined), then pack the sign
    bits into one long.  Same shape as ``minhash_signatures`` and for the
    same reason: the token hash is the expensive part.
    """
    base = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("tok"),
    ).select("doc", F.xxhash64("tok").alias("h"))
    votes = base.groupBy("doc").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    fp = F.lit(0).cast("long")
    for i in range(64):
        fp = fp.bitwiseOR(
            F.when(
                F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long"))
        )
    return votes.select("doc", fp.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs above threshold.

    Explode distinct shingles → self-equi-join on shingle (the shuffle key)
    → |∩| per pair → |A∪B| = |A|+|B|−|∩|.  The equi-join means only docs
    *sharing a shingle* ever pair up — no O(n²) crossjoin.

    ``max_doc_freq`` is the stop-shingle filter for corpus scale: a shingle
    appearing in d documents generates O(d²) join rows, so one boilerplate
    phrase shared by 1M docs would alone produce 10¹² pairs.  Dropping
    shingles with doc-frequency > max_doc_freq bounds the fan-out; sizes
    are computed on the FILTERED shingle sets so the Jaccard stays an exact
    similarity over the reduced universe (standard practice — common
    shingles carry no near-dup signal).
    """
    sh = shingle_rows(df, id_col, text_col, n).distinct()
    if max_doc_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
        keep = freq.where(F.col("__df") <= max_doc_freq).select("shingle")
        sh = sh.join(keep, "shingle")
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


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Near-dup clustering: connected components over a pair graph →
    (id, component) with component = min id in the group.

    Pairs alone don't answer "which docs do I drop": A~B and B~C must
    collapse to one group even when A~C was never emitted.  Distributed
    min-label propagation: every node starts labeled with itself; each
    round every node takes the min label in its neighborhood; converges in
    O(graph diameter) rounds (near-dup clusters are shallow — usually ≤3).
    All joins are on the node id; no driver-side union-find, no O(V) state
    on any single machine.  Iterations stop early when a round changes no
    labels (checked with one count per round — small aggregates, and near-
    dup graphs are tiny relative to the corpus).
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("__nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("__nmin"), F.col("component"))
                ).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)  # cut lineage growth
        changed = (
            labels.alias("o")
            .join(new_labels.alias("n"), "id")
            .where(F.col("o.component") != F.col("n.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def neardup_groups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Full near-dup pipeline: exact n-gram Jaccard pairs → connected
    components → (doc, keep) decisions (keep = min id per component;
    singleton docs are implicitly kept — they never appear in pairs)."""
    pairs = ngram_jaccard_pairs(df, id_col, text_col, n, threshold, max_doc_freq)
    comp = connected_components(pairs)
    return comp.select(
        F.col("id").alias(id_col),
        F.col("component").alias("keep_id"),
        (F.col("id") == F.col("component")).alias("is_keeper"),
    )


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket_size: int = 1000,
    log_drops: bool = False,
) -> DataFrame:
    """SimHash near-dup pairs: 64-bit fingerprints → 16-bit band blocking →
    exact Hamming re-check.

    Pigeonhole guarantee: fingerprints within Hamming distance d share at
    least one of ``bands`` bands unchanged when d < bands — so blocking on
    exact band match has 100% recall for d ≤ bands-1.  The re-check is
    ``bit_count(xor)`` — one codegen'd instruction pair per candidate.

    ``max_bucket_size`` bounds the per-(band, bucket) fan-out — near-
    constant documents collapse to a handful of fingerprints and would
    otherwise emit O(m²) candidates from one bucket (``cap_bucket_fanout``).
    """
    width = 64 // bands
    fp = simhash64(df, id_col, text_col)
    banded = fp.select(
        "doc",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", b * width).bitwiseAND(
                        F.lit((1 << width) - 1)
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    banded = cap_bucket_fanout(
        banded, ["band", "bucket"], max_bucket_size, log_drops, "simhash"
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.col("a.simhash").alias("__fa"),
            F.col("b.simhash").alias("__fb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("__fa").bitwiseXOR(F.col("__fb"))).alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)
