"""tools/audit_plans.py detector tests: each anti-pattern detector must
FIRE on a planted bad plan and stay SILENT on the scale-safe twin — a plan
gate whose detectors never fire is indistinguishable from a broken one.

The registry-wide sweep itself runs in tools/run_all.py; these tests pin
the detector logic so a Spark plan-string format drift (node renames,
bracket layout) breaks the suite loudly instead of silently passing
everything.
"""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F
from pyspark.sql import Window

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from audit_plans import _is_unpartitioned_window, detect  # noqa: E402


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _dets(df) -> set:
    return {d for d, _ in detect(_plan(df))}


# ---------------------------------------------------------------- unit: parser


def test_window_group_parser_on_captured_strings():
    # unpartitioned + ordered (the bad shape)
    assert _is_unpartitioned_window(
        " [row_number() windowspecdefinition(id#0L ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) "
        "AS rn#2], [id#0L ASC NULLS FIRST]"
    )
    # partitioned + ordered
    assert not _is_unpartitioned_window(
        " [row_number() windowspecdefinition(k#1L, id#0L ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) "
        "AS rn#4], [k#1L], [id#0L ASC NULLS FIRST]"
    )
    # partitioned, whole-frame (no order group) — the r7 false-positive shape
    assert not _is_unpartitioned_window(
        " [min(value#4) windowspecdefinition(event_type#3, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "unboundedfollowing$())) AS _we0#12], [event_type#3]"
    )
    # a DESC order column must also read as an order spec
    assert _is_unpartitioned_window(" [exprs], [n#5L DESC NULLS LAST]")


# ------------------------------------------------------------- spark: windows


def test_global_window_fires_and_partitioned_is_silent(spark):
    df = spark.range(100).withColumn("k", F.col("id") % 5)
    bad = df.withColumn("rn", F.row_number().over(Window.orderBy("id")))
    good = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("k").orderBy("id"))
    )
    wholeframe = df.withColumn(
        "mx", F.max("id").over(Window.partitionBy("k"))
    )
    assert "global-window" in _dets(bad)
    assert "global-window" not in _dets(good)
    assert "global-window" not in _dets(wholeframe)


# ------------------------------------------------------ spark: python udf


def test_row_python_udf_fires_and_arrow_is_silent(spark):
    from pyspark.sql.types import LongType

    df = spark.range(100)
    row_udf = F.udf(lambda x: x + 1, LongType())
    bad = df.withColumn("y", row_udf("id"))
    assert "row-python-udf" in _dets(bad)

    pdf_udf = F.pandas_udf(lambda s: s + 1, LongType())
    good = df.withColumn("y", pdf_udf("id"))
    assert "row-python-udf" not in _dets(good)


# ------------------------------------------------------- spark: cartesian


def test_cartesian_fires_and_broadcast_nlj_is_silent(spark):
    left = spark.range(1000).withColumnRenamed("id", "a")
    right = spark.range(1000).withColumnRenamed("id", "b")
    # force a true CartesianProduct: disable auto-broadcast, no join keys
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bad = left.crossJoin(right)
        assert "cartesian" in _dets(bad)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    good = left.crossJoin(F.broadcast(right))
    assert "cartesian" not in _dets(good)


# ------------------------------------------------- spark: global agg is fine


def test_global_agg_single_partition_not_flagged(spark):
    df = spark.range(1000).withColumn("k", F.col("id") % 7)
    agg = df.agg(F.sum("id").alias("s"))
    assert _dets(agg) == set()
    # global sort via rangepartitioning is also fine
    srt = df.orderBy("id")
    assert _dets(srt) == set()
