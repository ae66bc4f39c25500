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
) -> DataFrame:
    """Left rows + latest right ``value_cols`` as of each left row's time.

    ``strict=True`` uses ``right.time < left.time`` (right rows at the exact
    same timestamp are not visible).  ``tolerance`` (a Column-compatible
    interval/number, e.g. ``F.expr("INTERVAL 5 SECONDS")``) nulls the as-of
    values when the matched right row is older than ``left.time - tolerance``
    — pandas merge_asof's tolerance, expressed with one extra filled column
    (the as-of right *time*) and a conditional, still one shuffle.
    """
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
