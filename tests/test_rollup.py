"""A1/A2 rollup composition: snapshot→min→day must equal snapshot→day
directly (associativity of the bar algebra) — the contract that makes the
reference's chained convert services (`init-sisdb.conf:288-298`) safe."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from ago_sisdb_spark.operators.rollup import bars_to_coarser, ohlcv


@pytest.fixture(scope="module")
def ticks(spark):
    base = datetime(2024, 1, 1, 9, 30, 0)
    rows = []
    for sym, p0 in (("A", 100.0), ("B", 50.0)):
        for i in range(240):  # 2 hours of 30s ticks
            rows.append(
                (sym, base + timedelta(seconds=30 * i), p0 + ((i * 7) % 13) - 6, i)
            )
    return spark.createDataFrame(rows, "sym string, ts timestamp, price double, seq int")


def test_two_stage_equals_direct(spark, ticks):
    direct = ohlcv(ticks, ["sym"], "ts", "price", "1 hour", order_col="seq")
    mins = ohlcv(ticks, ["sym"], "ts", "price", "1 minute", order_col="seq")
    chained = bars_to_coarser(mins, ["sym"], "bar_start", "1 hour")

    d = {(r.sym, str(r.bar_start)): (r.open, r.high, r.low, r.close, r.volume)
         for r in direct.collect()}
    c = {(r.sym, str(r.bar_start)): (r.open, r.high, r.low, r.close, r.volume)
         for r in chained.collect()}
    assert d == c


def test_packed_order_equals_struct_order(spark):
    """The packed-long (time, id) ordering (hash-agg fast path) must pick
    the same open/close as the struct ordering, including same-timestamp
    ties where ids arrive out of time order."""
    from datetime import datetime

    t0 = datetime(2024, 1, 1, 9, 0, 0)
    t1 = datetime(2024, 1, 1, 9, 20, 0)
    rows = [  # two events share t0 (tie → lower seq wins open)
        ("A", t0, 11.0, 5),
        ("A", t0, 10.0, 2),
        ("A", t1, 12.0, 1),  # latest time but LOWEST id: close must be 12
        ("B", t1, 7.0, 9),
    ]
    df = spark.createDataFrame(rows, "sym string, ts timestamp, price double, seq long")
    fast = ohlcv(df, ["sym"], "ts", "price", "1 hour", order_col="seq")
    slow = ohlcv(df, ["sym"], "ts", "price", "1 day", order_col="seq")  # struct path
    f = {r.sym: (r.open, r.close) for r in fast.collect()}
    s = {r.sym: (r.open, r.close) for r in slow.collect()}
    assert f == s == {"A": (10.0, 12.0), "B": (7.0, 7.0)}
    # and the fast path actually hash-aggregates (the whole point)
    fast.collect()
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan and "SortAggregate" not in plan
    slow.collect()
    plan_slow = slow._jdf.queryExecution().executedPlan().toString()
    assert "SortAggregate" in plan_slow  # struct fallback is the slow shape


def test_ohlcv_values(spark, ticks):
    bars = ohlcv(ticks, ["sym"], "ts", "price", "1 hour", order_col="seq")
    b = {(r.sym, str(r.bar_start)): r for r in bars.collect()}
    first_a = b[("A", "2024-01-01 09:00:00")]
    # ticks 0..59 (09:30:00..09:59:30): price = 100 + (7i % 13) - 6
    prices = [100 + ((i * 7) % 13) - 6 for i in range(60)]
    assert first_a.open == prices[0]
    assert first_a.close == prices[-1]
    assert first_a.high == max(prices)
    assert first_a.low == min(prices)
    assert first_a.volume == 60


def test_ntz_timestamp_matches_timestamp(spark, ticks):
    """events.parquet reads as TIMESTAMP_NTZ in this environment (r3 verdict
    #1/#4): the packed-long fast path must produce identical bars for both
    timestamp flavors AND keep the HashAggregate shape on NTZ input."""
    from pyspark.sql import functions as F

    ntz = ticks.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    assert dict(ntz.dtypes)["ts"] == "timestamp_ntz"
    tz_bars = ohlcv(ticks, ["sym"], "ts", "price", "1 hour", order_col="seq")
    ntz_bars = ohlcv(ntz, ["sym"], "ts", "price", "1 hour", order_col="seq")
    a = {(r.sym, str(r.bar_start)): (r.open, r.high, r.low, r.close, r.volume)
         for r in tz_bars.collect()}
    b = {(r.sym, str(r.bar_start)): (r.open, r.high, r.low, r.close, r.volume)
         for r in ntz_bars.collect()}
    assert a == b
    plan = ntz_bars._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan and "SortAggregate" not in plan


def test_resample_ffill_fills_gaps(spark):
    """Controlled grid: bars at hours 0,1,3,6 → slots 2,4,5 generated with
    is_gap=true, close carried forward, volume NULL on gaps."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from ago_sisdb_spark.operators.resample import resample_ffill

    t = lambda h: datetime(2024, 1, 1, h, 0, 0)  # noqa: E731
    rows = [("A", t(0), 10.0, 3), ("A", t(1), 11.0, 4),
            ("A", t(3), 13.0, 1), ("A", t(6), 16.0, 2),
            ("B", t(2), 5.0, 9)]
    bars = spark.createDataFrame(
        rows, "sym string, bar_start timestamp, close double, volume long"
    )
    out = resample_ffill(
        bars, ["sym"], "bar_start", "1 hour", ["close"], carry_cols=["volume"]
    )
    a = {r.bar_start.hour: r for r in out.where(F.col("sym") == "A").collect()}
    assert sorted(a) == [0, 1, 2, 3, 4, 5, 6]  # complete grid
    assert [a[h].is_gap for h in range(7)] == [
        False, False, True, False, True, True, False]
    assert a[2].close == 11.0 and a[4].close == 13.0 and a[5].close == 13.0
    assert a[2].volume is None and a[3].volume == 1
    # single-bar key: grid of one, no gaps
    b = out.where(F.col("sym") == "B").collect()
    assert len(b) == 1 and not b[0].is_gap and b[0].close == 5.0


def test_resample_rejects_internal_name_collisions(spark):
    """Inputs already carrying __present or is_gap would corrupt the
    left-join gap probe — the operator must refuse them loudly."""
    from datetime import datetime

    import pytest

    from ago_sisdb_spark.operators.resample import resample_ffill

    bars = spark.createDataFrame(
        [("A", datetime(2024, 1, 1), 1.0, 1)],
        "sym string, bar_start timestamp, close double, __present long",
    )
    with pytest.raises(ValueError, match="__present"):
        resample_ffill(bars, ["sym"], "bar_start", "1 hour", ["close"])
    bars2 = bars.withColumnRenamed("__present", "is_gap")
    with pytest.raises(ValueError, match="is_gap"):
        resample_ffill(bars2, ["sym"], "bar_start", "1 hour", ["close"])


def test_property_resample_invariants_random_gaps(spark):
    """Property over random gap patterns: the output grid is exactly
    [min,max] at 1h steps per key; original bars pass through unchanged
    with is_gap=false; every gap row carries the latest preceding close."""
    import random
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from ago_sisdb_spark.operators.resample import resample_ffill

    rnd = random.Random(99)
    base = datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    truth = {}
    for sym in ("A", "B", "C"):
        hours = sorted(rnd.sample(range(48), rnd.randrange(2, 20)))
        for h in hours:
            price = round(rnd.uniform(10, 99), 2)
            rows.append((sym, base + timedelta(hours=h), price, h))
            truth.setdefault(sym, {})[h] = price
    bars = spark.createDataFrame(
        rows, "sym string, bar_start timestamp, close double, volume long"
    )
    out = resample_ffill(
        bars, ["sym"], "bar_start", "1 hour", ["close"], carry_cols=["volume"]
    ).collect()
    by_sym = {}
    for r in out:
        by_sym.setdefault(r.sym, {})[int((r.bar_start - base).total_seconds() // 3600)] = r
    for sym, slots in truth.items():
        lo, hi = min(slots), max(slots)
        got = by_sym[sym]
        assert sorted(got) == list(range(lo, hi + 1))  # complete, no extras
        last = None
        for h in range(lo, hi + 1):
            if h in slots:
                last = slots[h]
                assert not got[h].is_gap and got[h].close == last
                assert got[h].volume == h
            else:
                assert got[h].is_gap and got[h].close == last
                assert got[h].volume is None
