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
