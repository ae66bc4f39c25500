"""Binned keyless interval joins (operators/intervaljoin): equivalence to
the naive cross-product filter on random data, exactly-once pair emission,
and the plan property the module exists for — an EQUI join on the bin id
instead of BroadcastNestedLoopJoin/cartesian."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ago_sisdb_spark.operators.intervaljoin import (
    bin_join_intervals,
    bin_join_points,
)


def _ivs(spark, rng, n, prefix, max_lo=1000, max_span=40):
    rows = []
    for i in range(n):
        lo = rng.randrange(0, max_lo)
        rows.append((i, lo, lo + rng.randrange(0, max_span)))
    return spark.createDataFrame(
        rows, f"{prefix}id long, {prefix}lo long, {prefix}hi long"
    )


@pytest.mark.parametrize("width", [7, 40, 1000])
def test_points_match_naive(spark, width):
    rng = random.Random(42)
    iv = _ivs(spark, rng, 120, "a_")
    pts = spark.createDataFrame(
        [(i, rng.randrange(0, 1050)) for i in range(300)], "pid long, p long"
    )
    got = sorted(
        (r["a_id"], r["pid"])
        for r in bin_join_points(iv, pts, "a_lo", "a_hi", "p", width).collect()
    )
    want = sorted(
        (r["a_id"], r["pid"])
        for r in iv.crossJoin(pts)
        .where((F.col("p") >= F.col("a_lo")) & (F.col("p") <= F.col("a_hi")))
        .collect()
    )
    assert got == want and len(got) == len(set(got))


@pytest.mark.parametrize("width", [7, 40, 1000])
def test_intervals_match_naive(spark, width):
    rng = random.Random(7)
    a = _ivs(spark, rng, 90, "a_")
    b = _ivs(spark, rng, 110, "b_")
    got = sorted(
        (r["a_id"], r["b_id"])
        for r in bin_join_intervals(
            a, b, "a_lo", "a_hi", "b_lo", "b_hi", width
        ).collect()
    )
    want = sorted(
        (r["a_id"], r["b_id"])
        for r in a.crossJoin(b)
        .where(
            (F.col("a_lo") <= F.col("b_hi")) & (F.col("b_lo") <= F.col("a_hi"))
        )
        .collect()
    )
    # exactly-once: the first-shared-bin rule must not duplicate a pair
    assert got == want and len(got) == len(set(got))


def test_keys_compose(spark):
    rng = random.Random(3)
    a = _ivs(spark, rng, 80, "a_").withColumn("k", F.col("a_id") % 3)
    b = _ivs(spark, rng, 80, "b_").withColumn("k", F.col("b_id") % 3)
    got = sorted(
        (r["k"], r["a_id"], r["b_id"])
        for r in bin_join_intervals(
            a, b, "a_lo", "a_hi", "b_lo", "b_hi", 25, keys=["k"]
        ).collect()
    )
    want = sorted(
        (r["a.k"], r["a_id"], r["b_id"])
        for r in a.alias("a").crossJoin(b.alias("b"))
        .where(
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a_lo") <= F.col("b_hi"))
            & (F.col("b_lo") <= F.col("a_hi"))
        )
        .select(F.col("a.k").alias("a.k"), "a_id", "b_id")
        .collect()
    )
    assert got == want


def test_binned_plan_is_equi_not_nested_loop(spark):
    rng = random.Random(1)
    iv = _ivs(spark, rng, 50, "a_")
    pts = spark.createDataFrame(
        [(i, rng.randrange(0, 1050)) for i in range(50)], "pid long, p long"
    )
    binned = bin_join_points(iv, pts, "a_lo", "a_hi", "p", 40)
    binned.collect()
    plan = binned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    naive = iv.crossJoin(pts).where(
        (F.col("p") >= F.col("a_lo")) & (F.col("p") <= F.col("a_hi"))
    )
    naive.collect()
    nplan = naive._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in nplan or "CartesianProduct" in nplan


def test_negative_bounds_and_validation(spark):
    # floor-div binning must stay correct for negative coordinates
    iv = spark.createDataFrame([(1, -25, -5)], "a_id long, a_lo long, a_hi long")
    pts = spark.createDataFrame(
        [(1, -25), (2, -10), (3, -5), (4, -26), (5, 0)], "pid long, p long"
    )
    got = sorted(
        r["pid"]
        for r in bin_join_points(iv, pts, "a_lo", "a_hi", "p", 7).collect()
    )
    assert got == [1, 2, 3]
    with pytest.raises(ValueError):
        bin_join_points(iv, pts, "a_lo", "a_hi", "p", 0)


def test_bins_exact_past_2_53(spark):
    """Bin math must be exact integer floor-div (the pmod identity), not
    float `/`-then-floor: int64 bounds past 2^53 (nanosecond epochs) lose
    precision as doubles, so the float quotient can land in the wrong bin
    and drop or duplicate matches.  Verify _floor_bin against Python's //
    on adversarial huge values, and the point join against a naive filter."""
    from ago_sisdb_spark.operators.intervaljoin import _floor_bin

    base = 2**60
    vals = [base + k for k in range(-3, 18)] + [base * 7 + 1, base * 7 - 1]
    df = spark.createDataFrame([(v,) for v in vals], "n long")
    for width in (7, 1000, 2**31 - 1):
        got = {
            r["n"]: r["b"]
            for r in df.select("n", _floor_bin(F.col("n"), width).alias("b"))
            .collect()
        }
        for v in vals:
            assert got[v] == v // width, (v, width, got[v], v // width)

    iv = spark.createDataFrame(
        [(1, base, base + 20), (2, base + 100, base + 120)],
        "a_id long, a_lo long, a_hi long",
    )
    pts = spark.createDataFrame(
        [(i, base + i) for i in range(-2, 125)], "pid long, p long"
    )
    got = sorted(
        (r["a_id"], r["pid"])
        for r in bin_join_points(iv, pts, "a_lo", "a_hi", "p", 7).collect()
    )
    want = sorted(
        (a, i)
        for (a, lo, hi) in [(1, base, base + 20), (2, base + 100, base + 120)]
        for i in range(-2, 125)
        if lo <= base + i <= hi
    )
    assert got == want
