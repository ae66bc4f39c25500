"""Last-record-per-key (reference P6, ``gets``: `workers/sisdb/sisdb.c:359-395`).

Two strategies, both shuffle once on the key:

- ``last_per_key`` — ``max_by(struct(*cols), order)`` aggregation.  Partial
  aggregation (map-side combine) means each upstream partition contributes at
  most one candidate row per key before the shuffle — at 100 TB with ~100k
  keys the shuffle is tiny regardless of input size.  Preferred.
- ``last_per_key_window`` — ``row_number() over (partition by key order by
  … desc) = 1``.  Shuffles *all* rows to sort within key partitions; kept for
  when the full row ordering is needed anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def last_per_key(df: DataFrame, keys: list[str], order_col: str | Column) -> DataFrame:
    """Latest full record per key via max_by — agg-side, scale-preferred."""
    order_c = F.col(order_col) if isinstance(order_col, str) else order_col
    payload = F.struct(*[F.col(c) for c in df.columns])
    out = df.groupBy(*keys).agg(F.max_by(payload, order_c).alias("__rec"))
    return out.select(*[F.col(f"__rec.{c}").alias(c) for c in df.columns])


def last_per_key_window(
    df: DataFrame, keys: list[str], order: list[Column]
) -> DataFrame:
    """Latest record per key via row_number window (full-sort strategy)."""
    w = Window.partitionBy(*keys).orderBy(*[c.desc() for c in order])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def topk_per_key(
    df: DataFrame, keys: list[str], order: list[Column], k: int
) -> DataFrame:
    """Top-k rows per key (reference O5 rank-by-score buckets,
    `src/core/sis_group.h:15-47`)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
