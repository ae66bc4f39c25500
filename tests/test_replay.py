"""T2/T3 replay: k-way merge ordering + deterministic tie-break
(SURVEY §7 hard part d)."""

from __future__ import annotations

from datetime import datetime

from ago_sisdb_spark.streaming.replay import kway_merge, replay_range


def _tables(spark):
    snap = spark.createDataFrame(
        [
            ("A", datetime(2024, 1, 1, 9, 0, 0), 1.0),
            ("A", datetime(2024, 1, 1, 9, 0, 2), 2.0),
            ("B", datetime(2024, 1, 1, 9, 0, 1), 3.0),
        ],
        "sym string, ts timestamp, p double",
    )
    bars = spark.createDataFrame(
        [
            ("A", datetime(2024, 1, 1, 9, 0, 0), 10.0, 11.0),
            ("B", datetime(2024, 1, 1, 9, 0, 3), 12.0, 13.0),
        ],
        "sym string, ts timestamp, o double, c double",
    )
    return [("snap", snap, "sym", "ts"), ("bars", bars, "sym", "ts")]


def test_merge_is_time_ordered(spark):
    out = kway_merge(_tables(spark)).collect()
    times = [r.event_time for r in out]
    assert times == sorted(times)
    assert len(out) == 5


def test_tie_break_is_source_order(spark):
    # At 9:00:00 both tables have an A row; 'snap' listed first must win.
    out = kway_merge(_tables(spark)).collect()
    first_two = [(r.source, str(r.event_time)) for r in out[:2]]
    assert first_two[0] == ("snap", "2024-01-01 09:00:00")
    assert first_two[1] == ("bars", "2024-01-01 09:00:00")


def test_replay_range_prunes_before_union(spark):
    out = replay_range(
        spark,
        _tables(spark),
        start=datetime(2024, 1, 1, 9, 0, 1),
        stop=datetime(2024, 1, 1, 9, 0, 2),
    ).collect()
    assert {(r.source, r.key) for r in out} == {("snap", "B"), ("snap", "A")}


def test_payload_preserved_as_json(spark):
    import json

    out = kway_merge(_tables(spark)).collect()
    bars_rows = [r for r in out if r.source == "bars"]
    payload = json.loads(bars_rows[0].payload)
    assert set(payload) == {"o", "c"}


def test_seq_col_tie_break_within_source(spark):
    """Explicit seq column pins ordering of same-time rows within a source
    (the reference's insertion order, made deterministic)."""
    from datetime import datetime

    t = datetime(2024, 1, 1, 9, 0, 0)
    df = spark.createDataFrame(
        [("A", t, 2, 20.0), ("A", t, 1, 10.0), ("A", t, 3, 30.0)],
        "sym string, ts timestamp, seq int, v double",
    ).repartition(3)
    out = kway_merge([("s", df, "sym", "ts")], seq_cols={"s": "seq"}).collect()
    import json

    assert [json.loads(r.payload)["seq"] for r in out] == [1, 2, 3]
