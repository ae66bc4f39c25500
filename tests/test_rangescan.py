"""P2/P3 range-semantics matrix (reference sisdb_fmap.h:102-137) on a
hand-built series — the "hard part (a)" of SURVEY §7, test-first."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from ago_sisdb_spark.operators import rangescan


@pytest.fixture(scope="module")
def series(spark):
    # three trading days with a gap day (the 4th has no data)
    rows = [
        (i, datetime(2024, 1, d, 9 + h, 0, 0), float(100 + i))
        for i, (d, h) in enumerate(
            [(1, 0), (1, 1), (1, 2), (2, 0), (2, 1), (3, 0), (5, 0), (5, 1)]
        )
    ]
    return spark.createDataFrame(rows, "seq long, ts timestamp, price double")


def _order():
    return [F.col("ts"), F.col("seq")]


def test_time_range_inclusive(series):
    out = rangescan.time_range(
        series, "ts", datetime(2024, 1, 1, 10), datetime(2024, 1, 2, 9)
    )
    assert [r.seq for r in out.orderBy("seq").collect()] == [1, 2, 3]


def test_time_range_open_ends(series):
    assert rangescan.time_range(series, "ts", None, None).count() == 8
    assert (
        rangescan.time_range(series, "ts", datetime(2024, 1, 3), None).count() == 3
    )
    assert (
        rangescan.time_range(series, "ts", None, datetime(2024, 1, 1, 23)).count() == 3
    )
    # LATEST sentinel behaves as open
    assert rangescan.time_range(series, "ts", rangescan.LATEST, None).count() == 8


def test_head_tail_last(series):
    assert [r.seq for r in rangescan.head_n(series, 3, _order()).collect()] == [0, 1, 2]
    tail = rangescan.tail_n(series, 2, _order())
    assert sorted(r.seq for r in tail.collect()) == [6, 7]
    last = rangescan.last_record(series, _order()).collect()
    assert len(last) == 1 and last[0].seq == 7


def test_ifprev_falls_back_to_previous_day_with_data(series):
    # Jan 4 has no rows -> fall back to Jan 3's full day
    out = rangescan.ifprev_day_scan(series, "ts", datetime(2024, 1, 4, 23))
    assert [r.seq for r in out.orderBy("seq").collect()] == [5]


def test_ifprev_exact_day_hit(series):
    out = rangescan.ifprev_day_scan(series, "ts", datetime(2024, 1, 5, 23))
    assert [r.seq for r in out.orderBy("seq").collect()] == [6, 7]


def test_ifprev_before_all_data_is_empty(series):
    out = rangescan.ifprev_day_scan(series, "ts", datetime(2023, 12, 31))
    assert out.count() == 0


def test_offset_shift(series):
    from datetime import datetime as dt

    # anchor at Jan 2 10:00 (seq 4); offset -2 -> seq 2; +1 -> seq 5
    back = rangescan.offset_shift(series, "ts", dt(2024, 1, 2, 10), -2, _order())
    assert [r.seq for r in back.collect()] == [2]
    fwd = rangescan.offset_shift(series, "ts", dt(2024, 1, 2, 10), 1, _order())
    assert [r.seq for r in fwd.collect()] == [5]
    # offset past the ends -> empty
    assert rangescan.offset_shift(series, "ts", dt(2024, 1, 2, 10), -10, _order()).count() == 0
    # offset +n with no record at/before the anchor -> empty (the anchor
    # itself must exist, matching the row_number-join semantics)
    assert rangescan.offset_shift(series, "ts", dt(2023, 12, 1), 2, _order()).count() == 0
    # the unkeyed form is window-free (r6 verdict #3): TakeOrdered limits
    # + a 1-row min_by/max_by, never a single-partition WindowExec
    for df in (back, fwd):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan, plan


def test_range_matrix_property_vs_model(spark):
    """Property: (start, stop, count) combinations match a Python list model
    on randomized series — the P3 matrix, exhaustively cross-checked."""
    import random

    rnd = random.Random(31)
    base = datetime(2024, 1, 1)
    from datetime import timedelta

    rows = sorted(
        (i, base + timedelta(minutes=rnd.randrange(0, 5000)))
        for i in range(120)
    )
    # make time strictly increasing to keep the model unambiguous
    rows = [(i, base + timedelta(minutes=m * 7 + i)) for i, (_, t) in enumerate(rows) for m in [i]]
    df = spark.createDataFrame(
        [(i, t, float(i)) for i, t in rows], "seq long, ts timestamp, v double"
    ).repartition(4)
    times = [t for _, t in rows]

    for _ in range(25):
        lo = rnd.choice(times + [None])
        hi = rnd.choice(times + [None])
        model = [
            (i, t)
            for i, t in rows
            if (lo is None or t >= lo) and (hi is None or t <= hi)
        ]
        got = rangescan.time_range(df, "ts", lo, hi)
        assert sorted(r.seq for r in got.collect()) == [i for i, _ in model]

        n = rnd.randrange(1, 6)
        head = rangescan.head_n(got, n, _order()).collect()
        assert [r.seq for r in head] == [i for i, _ in model[:n]]
        tail = rangescan.tail_n(got, n, _order())
        assert sorted(r.seq for r in tail.collect()) == sorted(
            i for i, _ in model[-n:]
        )


def test_offset_shift_property_vs_model(spark):
    """Property: the window-free unkeyed offset addressing (r7 rewrite)
    matches the Python list model — rn == max{rn: ts <= anchor} + offset,
    empty when the anchor has no record at/before it or the target falls
    off either end — across random anchors and offsets, including ties
    broken by the secondary order column."""
    import random
    from datetime import timedelta

    rnd = random.Random(77)
    base = datetime(2024, 1, 1)
    # duplicate timestamps on purpose: seq breaks ties
    rows = [(i, base + timedelta(minutes=(i // 2) * 10)) for i in range(60)]
    df = spark.createDataFrame(
        [(i, t, float(i)) for i, t in rows], "seq long, ts timestamp, v double"
    ).repartition(5)
    times = sorted({t for _, t in rows})

    for _ in range(30):
        anchor = rnd.choice(
            times + [base - timedelta(days=1), base + timedelta(days=30)]
        )
        offset = rnd.randrange(-8, 9)
        at_or_before = [i for i, t in rows if t <= anchor]
        if not at_or_before:
            want = []
        else:
            pos = len(at_or_before) - 1 + offset
            want = [rows[pos][0]] if 0 <= pos < len(rows) else []
        got = sorted(
            r.seq
            for r in rangescan.offset_shift(
                df, "ts", anchor, offset, _order()
            ).collect()
        )
        assert got == want, (anchor, offset, got, want)
