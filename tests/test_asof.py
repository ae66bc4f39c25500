"""J3 as-of join semantics: backward fill, strict mode, tolerance, and the
window-vs-pandas strategy agreement."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from ago_sisdb_spark.operators.asof import asof_join, asof_join_pandas


@pytest.fixture(scope="module")
def frames(spark):
    trades = spark.createDataFrame(
        [
            ("A", datetime(2024, 1, 1, 9, 30, 0), 100),
            ("A", datetime(2024, 1, 1, 9, 30, 10), 200),
            ("A", datetime(2024, 1, 1, 9, 31, 30), 300),
            ("B", datetime(2024, 1, 1, 9, 30, 5), 400),
        ],
        "sym string, ts timestamp, qty int",
    )
    quotes = spark.createDataFrame(
        [
            ("A", datetime(2024, 1, 1, 9, 29, 55), 10.0),
            ("A", datetime(2024, 1, 1, 9, 30, 10), 11.0),
            ("A", datetime(2024, 1, 1, 9, 30, 50), 12.0),
        ],
        "sym string, ts timestamp, px double",
    )
    return trades, quotes


def test_backward_fill(spark, frames):
    trades, quotes = frames
    out = {
        (r.sym, str(r.ts)): r.asof_px
        for r in asof_join(trades, quotes, ["sym"], "ts", ["px"]).collect()
    }
    assert out[("A", "2024-01-01 09:30:00")] == 10.0
    assert out[("A", "2024-01-01 09:30:10")] == 11.0  # same-ts visible
    assert out[("A", "2024-01-01 09:31:30")] == 12.0
    assert out[("B", "2024-01-01 09:30:05")] is None  # no quotes for B


def test_strict_excludes_same_timestamp(spark, frames):
    trades, quotes = frames
    out = {
        (r.sym, str(r.ts)): r.asof_px
        for r in asof_join(
            trades, quotes, ["sym"], "ts", ["px"], strict=True
        ).collect()
    }
    assert out[("A", "2024-01-01 09:30:10")] == 10.0  # 09:30:10 quote hidden


def test_tolerance_nulls_stale_matches(spark, frames):
    trades, quotes = frames
    out = {
        (r.sym, str(r.ts)): r.asof_px
        for r in asof_join(
            trades,
            quotes,
            ["sym"],
            "ts",
            ["px"],
            tolerance=F.expr("INTERVAL 20 SECONDS"),
        ).collect()
    }
    assert out[("A", "2024-01-01 09:30:00")] == 10.0  # 5s old: inside
    assert out[("A", "2024-01-01 09:31:30")] is None  # 40s old: stale
    assert out[("B", "2024-01-01 09:30:05")] is None


def test_window_and_pandas_strategies_agree(spark, frames):
    trades, quotes = frames
    a = sorted(
        (r.sym, str(r.ts), r.asof_px)
        for r in asof_join(trades, quotes, ["sym"], "ts", ["px"]).collect()
    )
    b = sorted(
        (r.sym, str(r.ts), r.asof_px)
        for r in asof_join_pandas(trades, quotes, ["sym"], "ts", ["px"]).collect()
    )
    assert a == b


# ---- r10: direction = forward / nearest, right-tie pinning -----------------


@pytest.fixture()
def dframes(spark):
    left = spark.createDataFrame(
        [(1, 10, "t10"), (1, 20, "t20"), (1, 30, "t30"), (2, 7, "lonely")],
        "k long, ts long, tag string",
    )
    # key 1: quotes at 5, 15, and TWO at 20 (ro pins the tie), one at 40;
    # key 2 has no quotes at all
    right = spark.createDataFrame(
        [(1, 5, "a", 1), (1, 15, "b", 2), (1, 20, "c", 3), (1, 20, "d", 4),
         (1, 40, "e", 5)],
        "k long, ts long, v string, ro long",
    )
    return left, right


def _vals(df):
    return {(r["k"], r["ts"]): r["asof_v"] for r in df.collect()}


def test_forward_direction(spark, dframes):
    left, right = dframes
    got = _vals(asof_join(
        left, right, ["k"], "ts", ["v"],
        direction="forward", right_order_col="ro",
    ))
    # first right at time >= t; equal-time tie -> SMALLEST ro
    assert got == {(1, 10): "b", (1, 20): "c", (1, 30): "e", (2, 7): None}


def test_backward_right_tie_pins_largest(spark, dframes):
    left, right = dframes
    got = _vals(asof_join(
        left, right, ["k"], "ts", ["v"], right_order_col="ro",
    ))
    assert got == {(1, 10): "a", (1, 20): "d", (1, 30): "d", (2, 7): None}


def test_strict_forward_excludes_equal(spark, dframes):
    left, right = dframes
    got = _vals(asof_join(
        left, right, ["k"], "ts", ["v"],
        direction="forward", strict=True, right_order_col="ro",
    ))
    assert got[(1, 20)] == "e"  # the 20s are invisible under strict >


def test_nearest_tie_goes_backward(spark, dframes):
    left, right = dframes
    got = _vals(asof_join(
        left, right, ["k"], "ts", ["v"],
        direction="nearest", right_order_col="ro",
    ))
    # t=10: back 5 (d=5) vs fwd 15 (d=5) -> tie -> backward 'a'
    # t=20: exact hit 'd' (tie pin) both ways -> backward 'd'
    # t=30: back 20 (d=10) vs fwd 40 (d=10) -> tie -> backward 'd'
    assert got == {(1, 10): "a", (1, 20): "d", (1, 30): "d", (2, 7): None}


def test_nearest_prefers_closer_side_and_tolerance(spark, dframes):
    left = spark.createDataFrame([(1, 18, "x")], "k long, ts long, tag string")
    _, right = dframes
    got = _vals(asof_join(
        left, right, ["k"], "ts", ["v"],
        direction="nearest", right_order_col="ro",
    ))
    assert got == {(1, 18): "c"}  # fwd 20 (d=2) beats back 15 (d=3); min ro
    # chosen side out of tolerance -> NULL, no fallback to the other side
    got_tol = _vals(asof_join(
        left, right, ["k"], "ts", ["v"],
        direction="nearest", right_order_col="ro", tolerance=F.lit(1),
    ))
    assert got_tol == {(1, 18): None}


def test_forward_tolerance(spark, dframes):
    left, right = dframes
    got = _vals(asof_join(
        left, right, ["k"], "ts", ["v"],
        direction="forward", right_order_col="ro", tolerance=F.lit(5),
    ))
    assert got[(1, 10)] == "b"  # 15 <= 10+5
    assert got[(1, 30)] is None  # 40 > 35


def test_directional_backward_matches_fast_path(spark):
    """The generalized path (triggered by right_order_col) must agree with
    the default backward fast path whenever right times are unique."""
    import random

    rng = random.Random(7)
    left = spark.createDataFrame(
        [(k, rng.randrange(0, 1000), i)
         for i, k in enumerate(rng.choices(range(5), k=80))],
        "k long, ts long, i long",
    )
    rts = rng.sample(range(1000), 200)  # unique times
    right = spark.createDataFrame(
        [(rng.randrange(0, 5), t, float(t)) for t in rts],
        "k long, ts long, v double",
    )
    fast = asof_join(left, right, ["k"], "ts", ["v"])
    gen = asof_join(left, right, ["k"], "ts", ["v"], right_order_col="v")
    key = lambda r: (r["k"], r["ts"], r["i"])  # noqa: E731
    assert sorted(map(lambda r: (key(r), r["asof_v"]), fast.collect())) == \
        sorted(map(lambda r: (key(r), r["asof_v"]), gen.collect()))


def test_directions_match_pandas_merge_asof(spark):
    """Random-data parity with pandas merge_asof in all three directions
    (unique right times per key, the regime where both are deterministic)."""
    import random

    import pandas as pd

    rng = random.Random(13)
    lrows = [(k, rng.randrange(0, 500), i)
             for i, k in enumerate(rng.choices(range(3), k=60))]
    rtimes = rng.sample(range(500), 120)
    rrows = [(rng.randrange(0, 3), t, float(t * 2 + 1)) for t in rtimes]
    left = spark.createDataFrame(lrows, "k long, ts long, i long")
    right = spark.createDataFrame(rrows, "k long, ts long, v double")
    lp = pd.DataFrame(lrows, columns=["k", "ts", "i"]).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["k", "ts", "v"]).sort_values("ts")
    for direction in ("backward", "forward", "nearest"):
        want_df = pd.merge_asof(lp, rp, on="ts", by="k", direction=direction)
        want = {(r.k, r.ts, r.i): (None if pd.isna(r.v) else r.v)
                for r in want_df.itertuples()}
        got = {
            (r["k"], r["ts"], r["i"]): r["asof_v"]
            for r in asof_join(
                left, right, ["k"], "ts", ["v"], direction=direction,
            ).collect()
        }
        assert got == want, direction


def test_bad_direction_rejected(spark, dframes):
    left, right = dframes
    with pytest.raises(ValueError):
        asof_join(left, right, ["k"], "ts", ["v"], direction="sideways")
