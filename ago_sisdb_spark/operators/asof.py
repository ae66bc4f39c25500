"""As-of join (reference J3 — the k-way time-interleave of
`src/core/sis_db.c:276-294,420-485` generalized to a relational as-of join).

For each left row, attach the most recent right row with
``right.time <= left.time`` for the same key.

Spark-first strategy (``asof_join``): tag both sides, ``unionByName``, then a
single window ``last(value, ignorenulls=True)`` per key ordered by
``(time, side, order)`` — right rows sort before left rows at equal
timestamps so the <= semantics hold.  One shuffle on the key, no
per-row point lookups; this is the sort-merge form of as-of and scales
linearly with total rows.  Skewed keys are handled by AQE; a per-key
pandas ``merge_asof`` fallback (``asof_join_pandas``) exists for
non-relational payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    time_col: str,
    value_cols: list[str],
    order_col: str | None = None,
    strict: bool = False,
    tolerance=None,
    direction: str = "backward",
    right_order_col: str | None = None,
) -> DataFrame:
    """Left rows + the as-of right ``value_cols`` at each left row's time.

    ``direction`` (r10 — the pandas merge_asof / kdb ``aj`` family):

    - ``backward`` (default): latest right row with time <= left.time.
    - ``forward``: earliest right row with time >= left.time — the same
      union+window shape scanned in DESCENDING time (a second ordering,
      not a second shuffle: both windows share the key partitioning).
    - ``nearest``: whichever of the two is closer in time, tie ->
      backward (pandas convention).  Both fills ride ONE union frame.

    ``strict=True`` excludes right rows at the exact same timestamp
    (< / > instead of <= / >=).  ``tolerance`` (a Column-compatible
    interval/number, e.g. ``F.expr("INTERVAL 5 SECONDS")``) nulls the
    as-of values when the matched right row is further than ``tolerance``
    from ``left.time`` on the matched side — one extra filled column (the
    as-of right *time*) and a conditional, still one shuffle.

    ``right_order_col`` pins tie-breaks among right rows sharing a
    timestamp: backward picks the LARGEST, forward the SMALLEST (the
    last-before / first-after convention) — without it, equal-time right
    rows are ordered arbitrarily by the distributed sort.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if direction != "backward" or right_order_col is not None:
        return _asof_join_directional(
            left, right, key_cols, time_col, value_cols,
            order_col, strict, tolerance, direction, right_order_col,
        )
    lcols = left.columns
    # side: right=0 sorts before left=1 at equal time → right row at equal
    # time IS visible (<=). strict flips the tag so left sorts first.
    r_side, l_side = (1, 0) if strict else (0, 1)

    r = right.select(
        *key_cols,
        time_col,
        F.lit(r_side).alias("__side"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in key_cols and c != time_col],
    )
    l = left.select(
        *key_cols,
        time_col,
        F.lit(l_side).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}")
          for c in value_cols],
        *[F.col(c) for c in lcols if c not in key_cols and c != time_col],
    )
    order = [F.col(time_col).asc(), F.col("__side").asc()]
    if order_col and order_col in lcols:
        order.append(F.col(order_col).asc_nulls_first())

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fills = [
        F.last(F.col(f"__v_{c}"), ignorenulls=True).over(w).alias(f"__asof_{c}")
        for c in value_cols
    ]
    if tolerance is not None:
        # carry the matched right-row time only when a staleness bound needs it
        r = r.withColumn("__rt", F.col(time_col))
        l = l.withColumn("__rt", F.lit(None).cast(left.schema[time_col].dataType))
        fills.append(F.last(F.col("__rt"), ignorenulls=True).over(w).alias("__asof_t"))
    filled = l.unionByName(r).select("*", *fills)
    is_left = F.col("__side") == F.lit(l_side)
    out_vals = []
    for c in value_cols:
        v = F.col(f"__asof_{c}")
        if tolerance is not None:
            v = F.when(
                F.col("__asof_t") >= F.col(time_col) - tolerance, v
            ).otherwise(F.lit(None))
        out_vals.append(v.alias(f"asof_{c}"))
    return filled.where(is_left).select(*[c for c in lcols], *out_vals)


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    time_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Per-key ``pandas.merge_asof`` via cogrouped applyInPandas.

    For payloads the window form can't carry (e.g. whole-row structs).  Each
    key group must fit in executor memory; keys are hash-distributed so the
    cluster form scales with key cardinality.
    """
    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    out_schema = StructType(
        list(left.schema.fields)
        + [StructField(f"asof_{c}", right.schema[c].dataType, True) for c in value_cols]
    )

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        l_pdf = l_pdf.sort_values(time_col)
        r_pdf = r_pdf.sort_values(time_col)[[time_col, *value_cols]].rename(
            columns={c: f"asof_{c}" for c in value_cols}
        )
        if r_pdf.empty:
            for c in value_cols:
                l_pdf[f"asof_{c}"] = None
            return l_pdf
        return pd.merge_asof(l_pdf, r_pdf, on=time_col, direction="backward")

    return (
        left.groupBy(*key_cols)
        .cogroup(right.groupBy(*key_cols))
        .applyInPandas(lambda _k, l, r: merge(l, r), out_schema)
    )


def _asof_join_directional(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    time_col: str,
    value_cols: list[str],
    order_col: str | None,
    strict: bool,
    tolerance,
    direction: str,
    right_order_col: str | None,
) -> DataFrame:
    """Generalized union+window as-of (forward / nearest / pinned right
    ties).  Same scale shape as the backward fast path: ONE shuffle on the
    key; the forward fill is the same window scanned in descending time
    (extra sort, not an extra exchange), and ``nearest`` evaluates both
    fills over one union frame then chooses per row."""
    lcols = left.columns
    r_side, l_side = (1, 0) if strict else (0, 1)
    ttype = left.schema[time_col].dataType
    rotype = (
        right.schema[right_order_col].dataType if right_order_col else None
    )

    r = right.select(
        *key_cols,
        time_col,
        F.lit(r_side).alias("__side"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in key_cols and c != time_col],
        F.col(time_col).alias("__rt"),
        (F.col(right_order_col) if right_order_col else F.lit(None).cast("long"))
        .alias("__ro"),
    )
    l = left.select(
        *key_cols,
        time_col,
        F.lit(l_side).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}")
          for c in value_cols],
        *[F.col(c) for c in lcols if c not in key_cols and c != time_col],
        F.lit(None).cast(ttype).alias("__rt"),
        F.lit(None).cast(rotype if rotype else "long").alias("__ro"),
    )

    order_b = [F.col(time_col).asc(), F.col("__side").asc(),
               F.col("__ro").asc_nulls_first()]
    order_f = [F.col(time_col).desc(), F.col("__side").asc(),
               F.col("__ro").desc_nulls_last()]
    if order_col and order_col in lcols:
        order_b.append(F.col(order_col).asc_nulls_first())
        order_f.append(F.col(order_col).asc_nulls_first())

    frame = (Window.unboundedPreceding, 0)
    wb = Window.partitionBy(*key_cols).orderBy(*order_b).rowsBetween(*frame)
    wf = Window.partitionBy(*key_cols).orderBy(*order_f).rowsBetween(*frame)

    fills = []
    if direction in ("backward", "nearest"):
        fills += [
            F.last(F.col(f"__v_{c}"), ignorenulls=True).over(wb).alias(f"__b_{c}")
            for c in value_cols
        ] + [F.last(F.col("__rt"), ignorenulls=True).over(wb).alias("__bt")]
    if direction in ("forward", "nearest"):
        fills += [
            F.last(F.col(f"__v_{c}"), ignorenulls=True).over(wf).alias(f"__f_{c}")
            for c in value_cols
        ] + [F.last(F.col("__rt"), ignorenulls=True).over(wf).alias("__ft")]

    filled = l.unionByName(r).select("*", *fills)
    t = F.col(time_col)
    out_vals = []
    for c in value_cols:
        if direction == "backward":
            v = F.col(f"__b_{c}")
            if tolerance is not None:
                v = F.when(F.col("__bt") >= t - tolerance, v)
        elif direction == "forward":
            v = F.col(f"__f_{c}")
            if tolerance is not None:
                v = F.when(F.col("__ft") <= t + tolerance, v)
        else:  # nearest: tie -> backward (pandas convention)
            bt, ft = F.col("__bt"), F.col("__ft")
            use_b = ft.isNull() | (bt.isNotNull() & ((t - bt) <= (ft - t)))
            vb, vf = F.col(f"__b_{c}"), F.col(f"__f_{c}")
            if tolerance is not None:
                # the CHOSEN side must be within tolerance — pandas nulls
                # rather than falling back to the farther side
                v = (
                    F.when(use_b & (bt >= t - tolerance), vb)
                    .when(~use_b & (ft <= t + tolerance), vf)
                )
            else:
                v = F.when(use_b, vb).otherwise(vf)
        out_vals.append(v.alias(f"asof_{c}"))
    is_left = F.col("__side") == F.lit(l_side)
    return filled.where(is_left).select(*[c for c in lcols], *out_vals)
