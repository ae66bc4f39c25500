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
