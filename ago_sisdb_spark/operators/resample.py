"""Grouped time-grid resample with forward fill (gap-free bar series).

The reference's range matrix serves `ifprev`-style "carry the previous
record into empty slots" reads (`sisdb_fmap.h:102-117` and the
trading-day fallback), and its chained convert services assume every bar
slot exists.  This operator generalizes that: align each key's bars to a
complete fixed-width grid and forward-fill chosen columns, so downstream
consumers (charting, joins on bar_start, training-window extraction)
never see holes.

Plan shape — all built-ins, no UDFs:

- the per-key grid is ONE `sequence(min_t, max_t, interval)` + explode:
  grid size per key = span/width, generated where the key's aggregate row
  lives (after the bounds groupBy, data never re-shuffles to build it);
- the left join grid←bars is an equi-join on (key, bar_start) — both
  sides already hash-partitioned by key from their aggregations, and
  bars is the SMALLER side (≤ grid);
- forward fill is `last(col, ignorenulls=True)` over
  (key ORDER BY t ROWS UNBOUNDED PRECEDING..CURRENT) — one window pass,
  no shuffle beyond the key partitioning already in place.

At 100 TB the grid explode is bounded by (keys × span/width) — output
cardinality, not input rows; for sparse keys over long spans pass
explicit bounds to avoid generating years of empty grid per dead key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    bars: DataFrame,
    keys: list[str],
    time_col: str,
    width: str,
    fill_cols: list[str],
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Complete each key's ``time_col`` grid at ``width`` steps and
    forward-fill ``fill_cols`` into the gaps.

    Emitted rows carry ``is_gap`` (true for generated slots).  Columns in
    ``fill_cols`` forward-fill; ``carry_cols`` (e.g. volume) are left NULL
    on gap rows — the caller decides zero-fill semantics.  ``time_col``
    values must already be width-aligned (bar starts, as produced by
    ``rollup.ohlcv``); the grid spans each key's own [min, max].
    """
    carry_cols = carry_cols or []
    # internal marker + output flag — an input that already carries either
    # name would silently corrupt the gap detection (left-join NULL probe)
    clash = {"__present", "is_gap"}.intersection(bars.columns)
    if clash:
        raise ValueError(
            f"resample_ffill: input columns collide with internals: {sorted(clash)}"
        )
    bounds = bars.groupBy(*keys).agg(
        F.min(time_col).alias("__t0"), F.max(time_col).alias("__t1")
    )
    grid = bounds.select(
        *keys,
        F.explode(
            F.sequence("__t0", "__t1", F.expr(f"INTERVAL {width}"))
        ).alias(time_col),
    )
    joined = grid.join(
        bars.withColumn("__present", F.lit(1)), [*keys, time_col], "left"
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(time_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = joined.select(
        *keys,
        time_col,
        F.col("__present").isNull().alias("is_gap"),
        *[
            F.last(c, ignorenulls=True).over(w).alias(c)
            for c in fill_cols
        ],
        *carry_cols,
    )
    return filled
