"""Streaming OHLCV rollup (A1 under Structured Streaming) with watermarks
(T5 late data).

The same groupBy(key, window) contract as ``operators/rollup.ohlcv``;
``withWatermark`` bounds state and admits late rows up to the allowed
lateness, mirroring the reference's insert-by-search (not append-only)
write path (`workers/sisdb/sisdb_fmap_write.c:344-395`).

Config-driven wiring like the reference's convert service
(`bin/init-sisdb.conf:288-298`): snapshot→min→day is two chained jobs of
this same function at different widths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_ohlcv(
    stream: DataFrame,
    key_cols: list[str],
    time_col: str,
    price_col: str,
    width: str,
    watermark: str = "10 minutes",
    volume_col: str | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Watermarked streaming bars; append-mode emits a bar once its window
    is past the watermark (bar finalization = the reference's day cutover
    flush, generalized).

    open/close are ``min_by``/``max_by`` against event time (plus optional
    ``order_col`` tie-break), never ``first``/``last`` — those are
    "first encountered", which is partition-order-dependent and wrong for
    OHLC under any parallelism.
    """
    order = (
        F.struct(F.col(time_col), F.col(order_col))
        if order_col
        else F.col(time_col)
    )
    aggs = [
        F.min_by(F.col(price_col), order).alias("open"),
        F.max(price_col).alias("high"),
        F.min(price_col).alias("low"),
        F.max_by(F.col(price_col), order).alias("close"),
        F.count(F.lit(1)).alias("volume"),
    ]
    if volume_col:
        aggs.append(F.sum(volume_col).alias("money"))
    out = (
        stream.withWatermark(time_col, watermark)
        .groupBy(*key_cols, F.window(F.col(time_col), width))
        .agg(*aggs)
    )
    return out.select(
        *key_cols,
        F.col("window.start").alias("bar_start"),
        *[c for c in out.columns if c not in (*key_cols, "window")],
    )
