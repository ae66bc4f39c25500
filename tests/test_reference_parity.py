"""Parity with the reference's own embedded operator test.

The only operator-level test in the reference is the `#if 0` harness in
`workers/sisdb/sisdb_fmap_ctrl.c:666-744` ("这里测试 sisdb_fmap_cmp_range 和
sisdb_fmap_cmp_where"): a 12-record date-scale table `_date_datas` and a
12-record ms-scale table `_time_datas`, probed with where/range calls whose
expected outcomes are documented in the inline comments:

- ``where(day, 0)``       → the rows exactly at day (1, many, or none)
- ``where(t, offset=-1)`` → one record back from the located row
- range ``(day1, day2)``  → inclusive slice
- range last-one          → the latest day's records
- range with ifprev       → no data at day ⇒ previous populated day

This suite replays those probes against our operators on the same data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ago_sisdb_spark.functions.timecodec import from_int_date
from ago_sisdb_spark.operators import rangescan

# _date_datas from sisdb_fmap_ctrl.c:686-698 — (yyyymmdd, newp, name)
DATE_DATAS = [
    (20191010, 1), (20191110, 2), (20191210, 3),
    (20200110, 4), (20200210, 5), (20200310, 6), (20200310, 7),
    (20210315, 8), (20210320, 9), (20210320, 10),
    (20210410, 11), (20210410, 12),
]

# _time_datas from sisdb_fmap_ctrl.c:700-713 — (epoch ms, newp)
TIME_DATAS = [
    (1630087372600, 1), (1630087572600, 2), (1630087672600, 3),
    (1630187272600, 4), (1630187372600, 5), (1630187372600, 6),
    (1630187572600, 7),
    (1630287372600, 8), (1630287372600, 9), (1630287372600, 10),
    (1630288372600, 11), (1630288372600, 12),
]


@pytest.fixture(scope="module")
def datedb(spark):
    df = spark.createDataFrame(DATE_DATAS, "date int, newp int")
    return df.select(
        from_int_date(F.col("date")).alias("date"), "newp"
    ).repartition(3)


@pytest.fixture(scope="module")
def timedb(spark):
    df = spark.createDataFrame(TIME_DATAS, "time long, newp int")
    return df.select(
        F.timestamp_millis(F.col("time")).alias("time"), "newp"
    ).repartition(3)


def _newps(df):
    return sorted(r.newp for r in df.collect())


class TestDateDbWhere:
    """cmp_where probes (sisdb_fmap_ctrl.c:800-812)."""

    def test_same_one(self, datedb):
        out = datedb.where(F.col("date") == F.lit("2021-03-15").cast("date"))
        assert _newps(out) == [8]  # "same one"

    def test_same_mul(self, datedb):
        out = datedb.where(F.col("date") == F.lit("2020-03-10").cast("date"))
        assert _newps(out) == [6, 7]  # "same mul"

    @pytest.mark.parametrize("day", ["2020-03-11", "2019-10-09", "2021-04-11"])
    def test_same_none(self, datedb, day):
        out = datedb.where(F.col("date") == F.lit(day).cast("date"))
        assert out.count() == 0  # "same none" ×3


class TestDateDbRange:
    """cmp_range probes (sisdb_fmap_ctrl.c:813-828)."""

    def test_range_last_one(self, datedb):
        # "0 0: 取最新的那一日数据" — all records of the latest populated day
        out = rangescan.ifprev_day_scan(datedb, "date", "9999-12-31")
        assert _newps(out) == [11, 12]

    def test_range_from_before_head_to_latest(self, datedb):
        # "day1 0: day1 到 当日的所有数据" with day1 before all data
        out = rangescan.time_range(datedb, "date", "2019-10-09", None)
        assert _newps(out) == list(range(1, 13))

    def test_range_day1_day2_inclusive(self, datedb):
        out = rangescan.time_range(datedb, "date", "2020-01-10", "2021-03-15")
        assert _newps(out) == [4, 5, 6, 7, 8]

    def test_range_day1_day1_exact(self, datedb):
        # "day1 day1: 取 == day1 的数据 可能有多条"
        out = rangescan.time_range(datedb, "date", "2020-03-10", "2020-03-10")
        assert _newps(out) == [6, 7]

    def test_range_ifprev_fallback(self, datedb):
        # "如果没有匹配 用前一个有效日期数据返回" — 2021-04-11 has no rows,
        # previous populated day is 2021-04-10
        out = rangescan.ifprev_day_scan(datedb, "date", "2021-04-11")
        assert _newps(out) == [11, 12]

    def test_range_ifprev_before_all_is_none(self, datedb):
        # "前面没有数据再返回 NULL"
        out = rangescan.ifprev_day_scan(datedb, "date", "2019-10-09")
        assert out.count() == 0


class TestTimeDbWhere:
    """ms-scale probes (sisdb_fmap_ctrl.c:741-746): same-timestamp streams
    keep multiple records; offset walks records, not timestamps."""

    def test_same_timestamp_multiple_records(self, timedb):
        out = timedb.where(
            F.col("time") == F.timestamp_millis(F.lit(1630187372600))
        )
        assert _newps(out) == [5, 6]

    def test_where_offset_minus_one(self, timedb):
        # where(1630087572600, -1): one record back from newp=2 → newp=1;
        # anchor on the epoch-ms value to match the reference probe exactly
        out = rangescan.offset_shift(
            timedb.withColumn("__ms", (F.unix_micros("time") / 1000).cast("long")),
            "__ms",
            1630087572600,
            -1,
            [F.col("__ms"), F.col("newp")],
        )
        assert _newps(out.select("newp")) == [1]

    def test_range_last_records_ms(self, timedb):
        # tail over ms data returns the latest records in record order
        out = rangescan.tail_n(timedb, 2, [F.col("time"), F.col("newp")])
        assert _newps(out) == [11, 12]


class TestTimeDbRange:
    """cmp_range probes over the ms-scale table (sisdb_fmap_ctrl.c:747-771)."""

    def test_range_day1_to_latest(self, timedb):
        # "day1 0: day1 到当日的所有数据" — from 1630187372600 to latest
        out = rangescan.time_range(
            timedb.withColumn("__ms", (F.unix_micros("time") / 1000).cast("long")),
            "__ms",
            1630187372600,
            None,
        )
        assert _newps(out.select("newp")) == [5, 6, 7, 8, 9, 10, 11, 12]

    def test_range_day1_day2(self, timedb):
        # "day1 day2" probe: 1630187272600 → 1630287372600
        out = rangescan.time_range(
            timedb.withColumn("__ms", (F.unix_micros("time") / 1000).cast("long")),
            "__ms",
            1630187272600,
            1630287372600,
        )
        assert _newps(out.select("newp")) == [4, 5, 6, 7, 8, 9, 10]

    def test_range_exact_ms_keeps_all_same_time_records(self, timedb):
        # "day1 day1": == day1, 可能有多条 — ms streams append at same ts
        out = rangescan.time_range(
            timedb.withColumn("__ms", (F.unix_micros("time") / 1000).cast("long")),
            "__ms",
            1630287372600,
            1630287372600,
        )
        assert _newps(out.select("newp")) == [8, 9, 10]
