"""OHLCV time-scale rollup (reference A1/A2).

The reference auto-aggregates fine-grained quotes into coarser bars
(snapshot→min→day) with open=first, high=max, low=min, close=last,
volume/money=sum — the contract is fixed by the bar schemas
(`bin/init-sisdb.conf:61-93`, convert wiring `:288-298`).

Spark: one ``groupBy(key, window(time, width))`` with ``min_by``/``max_by``
against a deterministic order column.  All six aggregates partial-aggregate
map-side, so the shuffle carries one row per (key, bar) — at 100 TB the
output cardinality, not the input size, bounds the shuffle.  The same
expression runs under Structured Streaming with a watermark
(``streaming/rollup_stream.py``).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WIDTH_US = {
    "microsecond": 1,
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
}


def _width_micros(width: str) -> int | None:
    """Window-width string → microseconds, None if unparseable/calendar."""
    m = re.fullmatch(r"\s*(\d+)\s+(\w+?)s?\s*", width)
    if not m or m.group(2) not in _WIDTH_US:
        return None
    return int(m.group(1)) * _WIDTH_US[m.group(2)]


def _epoch_micros(df: DataFrame, time_col: str):
    """Epoch-microseconds of ``time_col`` for either timestamp flavor.

    ``unix_micros`` only accepts TIMESTAMP (with local tz); parquet written
    with isAdjustedToUTC=false reads as TIMESTAMP_NTZ, where the cast to
    TIMESTAMP is lossless because the session timezone is pinned UTC
    (session.py).
    """
    col = F.col(time_col)
    if dict(df.dtypes).get(time_col) == "timestamp_ntz":
        col = col.cast("timestamp")
    return F.unix_micros(col)


def ohlcv(
    df: DataFrame,
    key_cols: list[str],
    time_col: str,
    price_col: str,
    width: str,
    order_col: str | None = None,
    volume_col: str | None = None,
) -> DataFrame:
    """Roll fine-grained prices up to ``width`` bars per key.

    ``order_col`` breaks same-timestamp ties deterministically (the reference
    relies on insertion order; we pin a total order — SURVEY §7 hard part d).
    Open/close follow event time FIRST, tie-broken by ``order_col`` —
    ordering by the tie-break id alone would be wrong whenever ids are not
    time-monotonic (matches streaming/rollup_stream.py's struct ordering).

    Plan shape (r2 verdict #7): a struct ordering key forces min_by/max_by
    into SortAggregate (struct buffers aren't hash-mutable — the r2 a1
    regression).  When ``width`` ≤ 2³² µs (~71 min) and ids fit 31 bits,
    (time, id) packs losslessly into ONE long — min_by/max_by compare only
    within a (key, window) group, where time order ≡ order of
    ``pmod(unix_micros(t), width_µs)`` for epoch-aligned tumbling windows —
    so the whole rollup stays in whole-stage-codegen HashAggregate with one
    exchange.  Wider (day+) bars fall back to the exact struct ordering.
    """
    width_us = _width_micros(width)
    if order_col is None:
        order = F.col(time_col)
    elif width_us is not None and width_us <= (1 << 32) - 1:
        # delta < 2^32 and id < 2^31 keep delta·2³¹ + id inside int64
        # (ANSI-safe); id ≥ 2³¹ would need the struct path
        delta = F.pmod(_epoch_micros(df, time_col), F.lit(width_us))
        order = delta * F.lit(1 << 31).cast("long") + F.col(order_col)
    else:
        order = F.struct(F.col(time_col), F.col(order_col))
    win = F.window(F.col(time_col), width)
    aggs = [
        F.min_by(F.col(price_col), order).alias("open"),
        F.max(price_col).alias("high"),
        F.min(price_col).alias("low"),
        F.max_by(F.col(price_col), order).alias("close"),
        F.count(F.lit(1)).alias("volume"),
    ]
    if volume_col:
        aggs.append(F.sum(volume_col).alias("money"))
    out = df.groupBy(*key_cols, win).agg(*aggs)
    return out.select(
        *key_cols,
        F.col("window.start").alias("bar_start"),
        *[c for c in out.columns if c not in (*key_cols, "window")],
    )


def bars_to_coarser(
    bars: DataFrame,
    key_cols: list[str],
    time_col: str,
    width: str,
) -> DataFrame:
    """Re-aggregate existing bars to a coarser scale (min→day, reference A2).

    first/last follow bar_start order; high/low/volume compose associatively,
    which is what makes multi-stage rollup (snapshot→min→day) safe.
    """
    order = F.col(time_col)
    win = F.window(F.col(time_col), width)
    out = bars.groupBy(*key_cols, win).agg(
        F.min_by("open", order).alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by(F.col("close"), order).alias("close"),
        F.sum("volume").alias("volume"),
    )
    return out.select(
        *key_cols,
        F.col("window.start").alias("bar_start"),
        "open", "high", "low", "close", "volume",
    )
