"""Similarity search over embedding columns (SURVEY §2.11).

Baseline: brute-force cosine top-k — a broadcast of the (tiny) probe set
against the full corpus; per-row score is one codegen'd ``zip_with`` +
``aggregate`` dot product, then top-k per probe via window.  This scales
linearly and is the correct *exact* method at any corpus size when the probe
set is small.

Scale path: LSH bucketing via random hyperplanes (signed projections) —
probe and corpus hash to the same buckets; candidate set per probe shrinks
by ~2^bits; exact re-rank inside buckets.  Bit hashing is also pure
expressions.  (IVF needs trained centroids = an offline k-means job; the
random-hyperplane variant is training-free and fully distributed.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str,
    vec_col: str,
    probe_id_col: str,
    k: int,
) -> DataFrame:
    """Exact cosine top-k per probe: broadcast probes × corpus scan."""
    p = probes.select(
        F.col(probe_id_col).alias("probe_id"), F.col(vec_col).alias("__pvec")
    )
    scored = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    ).crossJoin(F.broadcast(p))
    scored = scored.where(F.col("neighbor_id") != F.col("probe_id")).select(
        "probe_id",
        "neighbor_id",
        cosine(F.col("__cvec"), F.col("__pvec")).alias("score"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def hyperplane_bits(vec: Column, planes: list[list[float]]) -> Column:
    """LSH bucket id: sign bits of dot(vec, plane_i) packed into a long."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = dot(vec, F.array(*[F.lit(float(x)) for x in plane]))
        bucket = bucket.bitwiseOR(
            F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return bucket


def cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold (embedding near-dup ground truth).

    Self cross-join — O(n²) compare, the *correctness twin* for the LSH
    variant below.  Run on bounded slices; the 100 TB path is
    ``cosine_neardup_lsh``.
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("__va"), F.col("__vb")).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def cosine_neardup_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    dim: int,
    bits: int = 8,
    tables: int = 8,
    seed: int = 29,
) -> DataFrame:
    """Embedding-cosine near-dup pairs at scale: multi-table hyperplane LSH.

    ``tables`` independent hash tables (OR-amplification) generate candidate
    pairs via bucket equi-joins; every candidate is re-checked with the exact
    cosine, so precision is 1.0 and only recall depends on (bits, tables).
    The join key is (table, bucket) — candidate fan-out per bucket is
    ~n/2^bits per table, never O(n²).
    """
    import random

    rnd = random.Random(seed)
    planes = [
        [rnd.gauss(0, 1) for _ in range(dim)] for _ in range(bits * tables)
    ]
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__v"))
    hashed = base.select(
        "id",
        "__v",
        F.array(
            *[
                hyperplane_bits(F.col("__v"), planes[t * bits : (t + 1) * bits])
                for t in range(tables)
            ]
        ).alias("__buckets"),
    )
    exploded = hashed.select(
        "id", "__v", F.posexplode("__buckets").alias("table", "bucket")
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.__v").alias("__va"),
            F.col("b.__v").alias("__vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.select(
        "id_a", "id_b", cosine(F.col("__va"), F.col("__vb")).alias("cosine")
    ).where(F.col("cosine") >= threshold)


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str,
    vec_col: str,
    probe_id_col: str,
    k: int,
    n_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF-style ANN: partition the corpus into centroid lists, search only
    the ``nprobe`` nearest lists per probe.

    Deterministic training-free centroids: the ``n_centroids`` lowest-id
    vectors seed the lists (a k-means job would refine them offline; the
    query-side plan is identical).  Assignment is a broadcast join of the
    (tiny) centroid set against the corpus + ``min_by`` — one pass, no
    shuffle of vectors beyond the final per-probe top-k.
    """
    cent = (
        corpus.orderBy(F.col(id_col))
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("__cent")
        )
    )
    assigned = (
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"))
        .crossJoin(F.broadcast(cent))
        .groupBy("neighbor_id")
        .agg(
            F.min_by(
                F.struct(
                    F.col("centroid_id").alias("list_id"), F.col("__cvec").alias("vec")
                ),
                -cosine(F.col("__cvec"), F.col("__cent")),
            ).alias("__a")
        )
        .select("neighbor_id", "__a.list_id", F.col("__a.vec").alias("__cvec"))
    )
    probe_lists = (
        probes.select(
            F.col(probe_id_col).alias("probe_id"), F.col(vec_col).alias("__pvec")
        )
        .crossJoin(F.broadcast(cent))
        .select(
            "probe_id",
            "__pvec",
            F.col("centroid_id").alias("list_id"),
            cosine(F.col("__pvec"), F.col("__cent")).alias("__cscore"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("__cscore").desc(), F.col("list_id")
    )
    probe_lists = (
        probe_lists.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= nprobe)
        .select("probe_id", "__pvec", "list_id")
    )
    scored = (
        assigned.join(F.broadcast(probe_lists), "list_id")
        .where(F.col("neighbor_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "neighbor_id",
            cosine(F.col("__cvec"), F.col("__pvec")).alias("score"),
        )
    )
    wk = Window.partitionBy("probe_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(wk))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str,
    vec_col: str,
    probe_id_col: str,
    k: int,
    dim: int,
    bits: int = 8,
    seed: int = 13,
) -> DataFrame:
    """Approximate top-k: random-hyperplane bucket equi-join + exact re-rank.

    The equi-join on bucket replaces the cross join — candidates shrink
    ~2^bits-fold; recall is tuned by ``bits`` (fewer bits → more candidates).
    """
    import random

    rnd = random.Random(seed)
    planes = [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(bits)]

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        hyperplane_bits(F.col(vec_col), planes).alias("__bucket"),
    )
    p = probes.select(
        F.col(probe_id_col).alias("probe_id"),
        F.col(vec_col).alias("__pvec"),
        hyperplane_bits(F.col(vec_col), planes).alias("__bucket"),
    )
    scored = (
        c.join(F.broadcast(p), "__bucket")
        .where(F.col("neighbor_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "neighbor_id",
            cosine(F.col("__cvec"), F.col("__pvec")).alias("score"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
