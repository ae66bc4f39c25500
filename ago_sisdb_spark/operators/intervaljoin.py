"""Keyless interval joins via bin replication — the scale path Spark lacks.

A range predicate WITHOUT an equi key (`p.ts BETWEEN x.lo AND x.hi`, IP
ranges, genomic intervals, proximity windows) gives Catalyst nothing to
hash on: the only native plans are BroadcastNestedLoopJoin (needs one side
to fit in memory) or a cartesian — both dead at 100 TB.  The classic fix
(Databricks' range-join "bin" optimization, DuckDB's IEJoin family) is to
quantize the range dimension into fixed-width bins so the join becomes an
EQUI join on the bin id plus an exact residual filter:

- the INTERVAL side replicates to every bin it overlaps
  (``ceil(span / bin_width)`` rows — pick ``bin_width`` near the median
  span so replication stays O(1) per row);
- a POINT side lands in exactly ONE bin, so point-in-interval needs no
  de-duplication at all;
- interval×interval emits each pair once by keeping a match only in the
  FIRST bin both intervals share (``bin == floor(max(lo_a, lo_b) /
  bin_width)``) — a filter, never a distinct.

Optional ``keys`` compose: the join key becomes (keys..., bin).  Bounds
are NUMERIC (int64); callers convert timestamps with ``unix_micros``
(cast NTZ first — working-notes events gotcha).

Reference parity: the reference's $scope compound predicates
(`workers/sisdb/sisdb_fmap.h:99-100`) always ride a key; the keyless form
is beyond-reference scale surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _floor_bin(n, width: int):
    """Exact int64 floor-div.  Float ``/``-then-floor is wrong past 2^53
    (nanosecond epochs: the double quotient lands in the wrong bin), and
    even the pmod identity ``(n - pmod(n, w)) / w`` fails there because
    the numerator itself isn't double-representable.  SQL's integral
    ``div`` (truncating) stays in long arithmetic end-to-end; floor
    semantics for negative ``n`` come from the standard -1 adjustment
    when the division is inexact."""
    w = F.lit(width)
    q = F.call_function("div", n, w)
    return (
        q - F.when((n < 0) & (F.pmod(n, w) != 0), 1).otherwise(0)
    ).cast("long")


def _bins(lo, hi, width: int):
    return F.explode(
        F.sequence(_floor_bin(lo, width), _floor_bin(hi, width))
    )


def bin_join_points(
    intervals: DataFrame,
    points: DataFrame,
    lo_col: str,
    hi_col: str,
    point_col: str,
    bin_width: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """Inner join of points to every interval containing them
    (``lo <= p <= hi``), as an equi join on (keys..., bin).  The interval
    side replicates across its bins; each point sits in one bin, so every
    (interval, point) match is produced exactly once — no dedup pass.
    Column names must be disjoint across the two frames (keys excepted).
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    keys = keys or []
    iv = intervals.withColumn(
        "__bin", _bins(F.col(lo_col), F.col(hi_col), bin_width)
    )
    pt = points.withColumn(
        "__bin", _floor_bin(F.col(point_col), bin_width)
    )
    return (
        iv.join(pt, [*keys, "__bin"])
        .where(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("__bin")
    )


def bin_join_intervals(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bin_width: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """Inner join of overlapping intervals (``l_lo <= r_hi AND r_lo <=
    l_hi``) as an equi join on (keys..., bin).  Both sides replicate; a
    pair is kept only in the first bin the two intervals SHARE, so each
    overlapping pair appears exactly once without a distinct.
    Column names must be disjoint across the two frames (keys excepted)."""
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    keys = keys or []
    lv = left.withColumn("__bin", _bins(F.col(l_lo), F.col(l_hi), bin_width))
    rv = right.withColumn("__bin", _bins(F.col(r_lo), F.col(r_hi), bin_width))
    first_shared = _floor_bin(F.greatest(F.col(l_lo), F.col(r_lo)), bin_width)
    return (
        lv.join(rv, [*keys, "__bin"])
        .where(
            (F.col(l_lo) <= F.col(r_hi))
            & (F.col(r_lo) <= F.col(l_hi))
            & (F.col("__bin") == first_shared)
        )
        .drop("__bin")
    )
