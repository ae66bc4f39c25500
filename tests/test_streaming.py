"""Structured Streaming semantics: subscription key patterns (T1), file
replay with availableNow (T2), watermarked OHLCV bars (A1-streaming)."""

from __future__ import annotations

import time
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from ago_sisdb_spark.streaming.pubsub import key_pattern_filter, subscribe
from ago_sisdb_spark.streaming.replay import replay_stream
from ago_sisdb_spark.streaming.rollup_stream import streaming_ohlcv


def _await(query, timeout=60):
    query.awaitTermination(timeout)
    query.stop()


@pytest.fixture()
def tick_dir(spark, tmp_path):
    base = datetime(2024, 1, 1, 9, 30, 0)
    rows = [
        ("SH600600", base + timedelta(seconds=s), 10.0 + s, 100)
        for s in range(0, 120, 5)
    ] + [
        ("SZ300750", base + timedelta(seconds=s), 50.0 + s, 200)
        for s in range(0, 120, 10)
    ]
    df = spark.createDataFrame(rows, "sym string, ts timestamp, price double, vol int")
    path = str(tmp_path / "ticks")
    df.repartition(3).write.parquet(path)
    return path, df.schema


def test_key_pattern_filter_forms(spark):
    df = spark.createDataFrame(
        [("SH600600",), ("SH688001",), ("SZ300750",)], "sym string"
    )
    c = F.col("sym")

    def keys(pat):
        return sorted(
            r.sym for r in df.where(key_pattern_filter(c, pat)).collect()
        )

    assert keys("*") == ["SH600600", "SH688001", "SZ300750"]
    assert keys("SH600600") == ["SH600600"]
    assert keys("SH6*") == ["SH600600", "SH688001"]
    assert keys("SH688001,SZ300750") == ["SH688001", "SZ300750"]
    assert keys("*0075*") == ["SZ300750"]


def test_key_pattern_filter_literal_like_metachars(spark):
    """The reference glob knows only `*` — a literal `_` or `%` in a
    pattern must match ITSELF, not become a LIKE wildcard (keys like
    `stk_day` are routine; r8 fix)."""
    df = spark.createDataFrame(
        [("stk_day",), ("stkXday",), ("pct%01",), ("pctA01",)], "sym string"
    )
    c = F.col("sym")

    def keys(pat):
        return sorted(
            r.sym for r in df.where(key_pattern_filter(c, pat)).collect()
        )

    assert keys("stk_*") == ["stk_day"]          # underscore is literal
    assert keys("pct%*") == ["pct%01"]           # percent is literal
    assert keys("stk_day") == ["stk_day"]        # exact branch unaffected
    assert keys("*_day") == ["stk_day"]


def test_subscribe_availablenow_backfill(spark, tick_dir):
    path, schema = tick_dir
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(path)
    )
    q = subscribe(stream, "sym", "SH6*", query_name="sub_test")
    # availableNow not set on subscribe (live mode); wait for catch-up instead
    deadline = time.time() + 60
    expect = 24
    while time.time() < deadline:
        if spark.sql("select count(*) c from sub_test").first().c >= expect:
            break
        time.sleep(0.5)
    q.stop()
    got = spark.sql("select distinct sym from sub_test").collect()
    assert {r.sym for r in got} == {"SH600600"}
    assert spark.sql("select count(*) c from sub_test").first().c == expect


def test_replay_stream_backfill_terminates(spark, tick_dir):
    path, schema = tick_dir
    q = replay_stream(spark, path, schema, "ts", query_name="replay_test")
    _await(q)
    n = spark.sql("select count(*) c from replay_test").first().c
    assert n == 36


def test_streaming_ohlcv_bars(spark, tick_dir):
    path, schema = tick_dir
    stream = spark.readStream.schema(schema).parquet(path)
    bars = streaming_ohlcv(
        stream, ["sym"], "ts", "price", "1 minute", watermark="0 seconds",
        volume_col="vol",
    )
    q = (
        bars.writeStream.format("memory")
        .queryName("bars_test")
        .outputMode("complete")  # memory sink + agg w/o append finalization
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = {
        (r.sym, str(r.bar_start)): r
        for r in spark.sql("select * from bars_test").collect()
    }
    b = got[("SH600600", "2024-01-01 09:30:00")]
    # seconds 0..55 step 5 → open=10, high=10+55, low=10, close=65, 12 ticks
    assert b.open == 10.0 and b.low == 10.0
    assert b.high == 65.0 and b.close == 65.0
    assert b.volume == 12 and b.money == 1200
    b2 = got[("SZ300750", "2024-01-01 09:31:00")]
    assert b2.open == 110.0 and b2.close == 160.0 and b2.volume == 6


def test_foreachbatch_upsert_pipeline(spark, tmp_path):
    """T8 streaming form: readStream → foreachBatch(upsert into parquet
    state) — the Delta-MERGE shape of SURVEY §3.2, with the overwrite
    same-timestamp rule applied per micro-batch."""
    from ago_sisdb_spark.streaming.write import TimeScale, upsert

    src = str(tmp_path / "in")
    state_dir = str(tmp_path / "state")
    spark.createDataFrame(
        [("A", 1, 10.0), ("A", 2, 20.0)], "sym string, t int, v double"
    ).write.parquet(src)
    # second file: overwrite t=2, insert t=3
    spark.createDataFrame(
        [("A", 2, 21.0), ("A", 3, 30.0)], "sym string, t int, v double"
    ).write.mode("append").parquet(src)

    schema = "sym string, t int, v double"

    def apply_batch(batch_df, batch_id):
        import os

        if os.path.exists(state_dir):
            cur = spark.read.parquet(state_dir)
            merged = upsert(cur, batch_df, ["sym"], "t", TimeScale.MINUTE)
        else:
            merged = batch_df.dropDuplicates(["sym", "t"])
        merged.write.mode("overwrite").parquet(state_dir + ".tmp")
        out = spark.read.parquet(state_dir + ".tmp")
        out.write.mode("overwrite").parquet(state_dir)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()

    final = {(r.sym, r.t): r.v for r in spark.read.parquet(state_dir).collect()}
    assert final[("A", 1)] == 10.0
    assert final[("A", 3)] == 30.0
    assert ("A", 2) in final  # upserted exactly once (value depends on
    # micro-batch file order; both files touch t=2 and the last writer wins)
    assert len(final) == 3


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """T5 streaming dedup: duplicate (sym, ts) records arriving within the
    watermark collapse to one — the stream-native same-timestamp rule for
    overwrite-scale tables."""
    src = str(tmp_path / "dups")
    base = datetime(2024, 1, 1, 9, 30, 0)
    spark.createDataFrame(
        [("A", base, 10.0), ("A", base, 10.0), ("A", base + timedelta(seconds=1), 11.0)],
        "sym string, ts timestamp, v double",
    ).write.parquet(src)

    stream = spark.readStream.schema("sym string, ts timestamp, v double").parquet(src)
    deduped = stream.withWatermark("ts", "1 minute").dropDuplicatesWithinWatermark(
        ["sym", "ts"]
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    q.stop()
    rows = spark.sql("select * from dedup_test").collect()
    assert len(rows) == 2
    assert {str(r.ts) for r in rows} == {
        "2024-01-01 09:30:00",
        "2024-01-01 09:30:01",
    }


def test_lifecycle_listener_records_start_stop(spark, tmp_path):
    """T4: the OPEN/.../STOP tag protocol maps to StreamingQueryListener
    events; START and STOP must be observed for a finished backfill."""
    import time as _time

    from ago_sisdb_spark.streaming.pubsub import LifecycleLog

    src = str(tmp_path / "lc")
    spark.createDataFrame(
        [("A", datetime(2024, 1, 1, 9, 30, 0), 1.0)],
        "sym string, ts timestamp, v double",
    ).write.parquet(src)

    log = LifecycleLog()
    listener = log.listener()
    spark.streams.addListener(listener)
    try:
        q = (
            spark.readStream.schema("sym string, ts timestamp, v double")
            .parquet(src)
            .writeStream.format("memory")
            .queryName("lc_test")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        q.stop()
        deadline = _time.time() + 15
        while _time.time() < deadline:
            kinds = {k for k, _ in log.events}
            if {"START", "STOP"} <= kinds:
                break
            _time.sleep(0.25)
        assert {"START", "STOP"} <= {k for k, _ in log.events}
    finally:
        spark.streams.removeListener(listener)


def test_convert_service_fanout(spark, tick_dir):
    """Config-driven convert service: one tick stream fans out to 1-minute
    and 2-minute bar tables, each a watermarked streaming agg."""
    from ago_sisdb_spark.streaming.convert import ConvertService

    path, schema = tick_dir
    svc = ConvertService.from_config(
        {
            "key": ["sym"],
            "time": "ts",
            "price": "price",
            "volume": "vol",
            "convert": [
                {"width": "1 minute", "sink": "conv_min", "watermark": "0 seconds"},
                {"width": "2 minutes", "sink": "conv_2min", "watermark": "0 seconds"},
            ],
        }
    )
    stream = spark.readStream.schema(schema).parquet(path)
    svc.start(stream)
    svc.await_all()
    svc.stop_all()

    mins = {
        (r.sym, str(r.bar_start)): r for r in spark.sql("select * from conv_min").collect()
    }
    two = {
        (r.sym, str(r.bar_start)): r for r in spark.sql("select * from conv_2min").collect()
    }
    assert mins[("SH600600", "2024-01-01 09:30:00")].volume == 12
    assert mins[("SH600600", "2024-01-01 09:31:00")].volume == 12
    b = two[("SH600600", "2024-01-01 09:30:00")]
    # 2-minute bar covers both minutes: 24 ticks, open of first, close of last
    assert b.volume == 24
    assert b.open == 10.0 and b.close == 125.0
    assert b.money == 2400


def test_checkpoint_recovery_processes_only_new_data(spark, tmp_path):
    """S4 (WAL recovery): restarting a query from its checkpoint resumes at
    the committed offset — the second run sees only files added after the
    first stopped, giving exactly-once over the union of runs."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema = "sym string, t int, v double"

    spark.createDataFrame([("A", 1, 1.0), ("A", 2, 2.0)], schema).write.parquet(src)

    def run():
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    run()
    assert spark.read.parquet(out).count() == 2

    spark.createDataFrame([("B", 3, 3.0)], schema).write.mode("append").parquet(src)
    run()
    # the restart resumed from the committed offset: batch 0 not reprocessed,
    # so the union of both incarnations is exactly-once (3 rows, no dups)
    got = sorted((r.sym, r.t) for r in spark.read.parquet(out).collect())
    assert got == [("A", 1), ("A", 2), ("B", 3)]


def test_streaming_session_window(spark, tmp_path):
    """Sessionization under Structured Streaming: session_window + watermark
    merges events within the gap into one session per key."""
    src = str(tmp_path / "sess")
    base = datetime(2024, 1, 1, 9, 0, 0)
    rows = [
        ("u1", base + timedelta(minutes=m), 1.0) for m in (0, 5, 8)  # session 1
    ] + [
        ("u1", base + timedelta(minutes=m), 2.0) for m in (60, 62)   # session 2
    ]
    spark.createDataFrame(rows, "user string, ts timestamp, v double").write.parquet(src)
    stream = spark.readStream.schema("user string, ts timestamp, v double").parquet(src)
    sessions = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy("user", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = sorted(
        (r.n, r.total) for r in spark.sql("select * from sess_test").collect()
    )
    assert got == [(2, 4.0), (3, 3.0)]


def test_convert_service_parquet_sinks(spark, tick_dir, tmp_path):
    """Production form: per-width parquet sinks with checkpoints; append
    mode emits finalized bars (watermark-passed windows) to durable files."""
    from ago_sisdb_spark.streaming.convert import ConvertService

    path, schema = tick_dir
    base = str(tmp_path / "bars")
    svc = ConvertService.from_config(
        {
            "key": ["sym"],
            "time": "ts",
            "price": "price",
            "convert": [
                {"width": "1 minute", "sink": "pmin", "watermark": "0 seconds"}
            ],
        }
    )
    stream = spark.readStream.schema(schema).parquet(path)
    svc.start_to_parquet(stream, base)
    svc.await_all()
    svc.stop_all()
    out = spark.read.parquet(f"{base}/pmin")
    got = {(r.sym, str(r.bar_start)): r.volume for r in out.collect()}
    # ticks end at 09:31:55; watermark 0s finalizes the 09:30 window only
    assert got[("SH600600", "2024-01-01 09:30:00")] == 12
    assert got[("SZ300750", "2024-01-01 09:30:00")] == 6


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream join with watermarks + time-range condition (the
    streaming form of J4): each purchase joins clicks from the prior hour;
    state on both sides is bounded by the watermark + interval."""
    clicks_dir = str(tmp_path / "clicks")
    buys_dir = str(tmp_path / "buys")
    base = datetime(2024, 1, 1, 9, 0, 0)
    spark.createDataFrame(
        [("u1", base + timedelta(minutes=m)) for m in (0, 30, 200)],
        "user string, c_ts timestamp",
    ).write.parquet(clicks_dir)
    spark.createDataFrame(
        [("u1", base + timedelta(minutes=45))],
        "user string, p_ts timestamp",
    ).write.parquet(buys_dir)

    clicks = (
        spark.readStream.schema("user string, c_ts timestamp")
        .parquet(clicks_dir)
        .withWatermark("c_ts", "10 minutes")
    )
    buys = (
        spark.readStream.schema("user string, p_ts timestamp")
        .parquet(buys_dir)
        .withWatermark("p_ts", "10 minutes")
    )
    joined = buys.join(
        clicks,
        (buys.user == clicks.user)
        & (clicks.c_ts >= buys.p_ts - F.expr("INTERVAL 1 HOUR"))
        & (clicks.c_ts < buys.p_ts),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    rows = spark.sql("select * from ssj_test").collect()
    # clicks at 09:00 and 09:30 fall in the hour before the 09:45 purchase;
    # the 12:20 click does not
    assert sorted(str(r.c_ts) for r in rows) == [
        "2024-01-01 09:00:00",
        "2024-01-01 09:30:00",
    ]


def test_streaming_content_dedup(spark, tmp_path):
    """LLM ingest-time dedup: byte-identical documents arriving within the
    watermark collapse to the first copy; distinct bodies pass through."""
    from ago_sisdb_spark.streaming.dedupe import streaming_content_dedup

    src = str(tmp_path / "docs_stream")
    base = datetime(2024, 1, 1, 0, 0, 0)
    spark.createDataFrame(
        [
            (1, "the quick brown fox", base),
            (2, "the quick brown fox", base + timedelta(seconds=5)),
            (3, "a different document", base + timedelta(seconds=10)),
            (4, "the quick brown fox", base + timedelta(seconds=20)),
        ],
        "doc_id bigint, text string, ts timestamp",
    ).write.parquet(src)

    stream = spark.readStream.schema("doc_id bigint, text string, ts timestamp").parquet(src)
    deduped = streaming_content_dedup(stream, "text", "ts", delay="1 minute")
    q = (
        deduped.writeStream.format("memory")
        .queryName("content_dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    q.stop()
    rows = spark.sql("select * from content_dedup_test").collect()
    texts = sorted(r.text for r in rows)
    assert texts == ["a different document", "the quick brown fox"]
    assert "__digest" not in spark.sql("select * from content_dedup_test").columns


def test_subscribe_processing_time_live_arrival(spark, tick_dir, tmp_path):
    """T1 live-path smoke (r6 verdict #9): a processingTime micro-batch
    subscription keeps running after draining the backlog and picks up a
    file that arrives WHILE the query is live — the `sub` semantics
    availableNow runs can't exercise (they terminate at catch-up)."""
    path, schema = tick_dir
    stream = spark.readStream.schema(schema).parquet(path)
    q = subscribe(
        stream, "sym", "SH6*", query_name="sub_live",
        trigger={"processingTime": "500 milliseconds"},
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("select count(*) c from sub_live").first().c >= 24:
                break
            time.sleep(0.5)
        assert spark.sql("select count(*) c from sub_live").first().c == 24
        # live arrival: a new matching file lands while the query runs
        late = spark.createDataFrame(
            [("SH600600", datetime(2024, 1, 1, 9, 33), 99.0, 7)],
            schema,
        )
        late.coalesce(1).write.mode("append").parquet(path)
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("select count(*) c from sub_live").first().c >= 25:
                break
            time.sleep(0.5)
        got = spark.sql(
            "select count(*) c from sub_live where price = 99.0"
        ).first().c
        assert got == 1
    finally:
        q.stop()


def test_key_pattern_filter_property_vs_reference_glob(spark):
    """Property check of the r8 escape fix: for random keys (alphabet
    includes LIKE metachars '_' and '%') and random '*'-glob comma
    patterns, the Spark predicate must match a pure-Python reference
    matcher implementing the reference's semantics (only '*' is magic;
    comma = OR; everything else literal)."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = "ab_%*"
    keys = [
        "".join(c)
        for n in range(0, 4)
        for c in __import__("itertools").product("ab_%", repeat=n)
    ]
    kdf = spark.createDataFrame([(k,) for k in keys], "sym string").cache()
    kdf.count()

    def ref_match(key: str, pattern: str) -> bool:
        for term in (t.strip() for t in pattern.split(",") if t.strip()):
            if "*" in term:
                rx = "^" + ".*".join(re.escape(p) for p in term.split("*")) + "$"
                if re.match(rx, key):
                    return True
            elif key == term:
                return True
        return False

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.text(alphabet=alphabet, min_size=1, max_size=4),
            min_size=1,
            max_size=3,
        )
    )
    def check(terms):
        pattern = ",".join(terms)
        if pattern == "*":  # match-all shortcut is trivially correct
            return
        got = sorted(
            r.sym
            for r in kdf.where(
                key_pattern_filter(F.col("sym"), pattern)
            ).collect()
        )
        want = sorted(k for k in keys if ref_match(k, pattern))
        assert got == want, (pattern, got, want)

    check()


def test_streaming_quality_mix_gate_matches_batch(spark, tmp_path):
    """The r9 gate family is stream-safe: gopher_keep + the temperature
    mix gate applied per micro-batch (foreachBatch, rates computed ONCE
    from history — the artifact pattern) must accept exactly the same doc
    set as one batch pass over the full input, regardless of micro-batch
    boundaries (both gates are stateless per-row decisions)."""
    from ago_sisdb_spark.operators import prep, text

    # history fixes the rates (the persisted-plan artifact); the stream
    # is scored against it, never against its own micro-batch counts
    passing = "the and " + " ".join(f"w{i:03d}x" for i in range(60))
    rows = [
        (i, passing if i % 3 else "spam spam spam spam spam spam",
         f"s{i % 4}")
        for i in range(60)
    ]
    hist = spark.createDataFrame(rows, "doc_id long, text string, source string")
    rates = prep.temperature_rates(hist, "source", target_frac_e6=500_000)
    rates_rows = rates.collect()  # domains-sized plan, persisted in prod

    src = str(tmp_path / "in")
    out_dir = str(tmp_path / "kept")
    for lo, hi in ((0, 20), (20, 40), (40, 60)):  # 3 micro-batch files
        spark.createDataFrame(
            rows[lo:hi], "doc_id long, text string, source string"
        ).write.mode("append").parquet(src)

    plan = spark.createDataFrame(rates_rows)

    def apply_batch(batch_df, batch_id):
        gated = text.gopher_stats(
            batch_df, "doc_id", "text", passthrough=("source",)
        ).where("gopher_keep")
        kept = prep.apply_mix_gate(
            gated.select("doc_id", "source"), "doc_id", "source", plan
        )
        kept.write.mode("append").parquet(out_dir)

    q = (
        spark.readStream.schema("doc_id long, text string, source string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()

    streamed = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    batch_gated = text.gopher_stats(
        hist, "doc_id", "text", passthrough=("source",)
    ).where("gopher_keep")
    batch_kept = {
        r.doc_id
        for r in prep.apply_mix_gate(
            batch_gated.select("doc_id", "source"), "doc_id", "source", plan
        ).collect()
    }
    assert streamed == batch_kept
    assert 0 < len(streamed) < 40  # both gates actually cut something


def test_normalize_gate_stream_batch_parity(spark, tmp_path):
    """t28's normalization pass is stateless per row, so applying it per
    micro-batch (foreachBatch) must produce byte-identical normalized
    output to one batch pass — including the Arrow NFC UDF path — no
    matter where the micro-batch boundaries fall."""
    from pyspark.sql import functions as F

    from ago_sisdb_spark.operators.text import normalize_text_expr

    rows = [
        (i, f"doc {i} Café​  body\ttext {'x' * (i % 5)}")
        for i in range(30)
    ]
    src = str(tmp_path / "in")
    out_dir = str(tmp_path / "norm")
    for lo, hi in ((0, 10), (10, 20), (20, 30)):
        spark.createDataFrame(
            rows[lo:hi], "doc_id long, text string"
        ).write.mode("append").parquet(src)

    def apply_batch(batch_df, batch_id):
        batch_df.select(
            "doc_id", normalize_text_expr(F.col("text")).alias("norm")
        ).write.mode("append").parquet(out_dir)

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = {
        r["doc_id"]: r["norm"] for r in spark.read.parquet(out_dir).collect()
    }
    batch_df = spark.createDataFrame(rows, "doc_id long, text string")
    batch = {
        r["doc_id"]: r["norm"]
        for r in batch_df.select(
            "doc_id", normalize_text_expr(F.col("text")).alias("norm")
        ).collect()
    }
    assert streamed == batch and len(batch) == 30
    assert all("Café" in v for v in batch.values())  # NFC actually ran


def test_c4_and_script_gate_stream_batch_parity(spark, tmp_path):
    """t34/t35 are stateless per-row expression passes, so the streaming
    ingest gate (foreachBatch) must produce identical per-doc verdicts to
    one batch pass regardless of micro-batch boundaries — the same
    contract the t28 normalization pin makes, now for the C4 page filter
    and the script profile."""
    from pyspark.sql import functions as F

    from ago_sisdb_spark.operators import text as text_ops

    rows = []
    for i in range(24):
        body = (
            f"Document number {i} has a proper first sentence here.\n"
            "Another full sentence keeps the page alive today.\n"
            "A third complete sentence closes the page body.\n"
        )
        if i % 4 == 0:
            body += "contains lorem ipsum filler\n"
        if i % 3 == 0:
            # >= 10% of the page's letters must be cyrillic to trip the
            # integer mixed-script test (10*n_cyr >= n_letters)
            body += (("\u041f\u0440\u0438\u0432\u0435\u0442 \u043c\u0438\u0440 ") * 3).strip() + "\n"
        rows.append((i, body))
    src = str(tmp_path / "in")
    out_dir = str(tmp_path / "gated")
    for lo, hi in ((0, 8), (8, 16), (16, 24)):
        spark.createDataFrame(
            rows[lo:hi], "doc_id long, text string"
        ).write.mode("append").parquet(src)

    def gate(df):
        c4 = text_ops.c4_line_stats(df, "doc_id", "text").select(
            "doc_id", "c4_keep"
        )
        sp = text_ops.script_profile(df, "doc_id", "text").select(
            "doc_id", "dominant", "mixed"
        )
        return c4.join(sp, "doc_id")

    def apply_batch(batch_df, batch_id):
        gate(batch_df).write.mode("append").parquet(out_dir)

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = {
        r["doc_id"]: (r["c4_keep"], r["dominant"], r["mixed"])
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = {
        r["doc_id"]: (r["c4_keep"], r["dominant"], r["mixed"])
        for r in gate(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert streamed == batch and len(batch) == 24
    # the gates actually discriminate: lorem pages fail C4, the cyrillic
    # suffix flips mixed on
    assert not batch[0][0] and batch[1][0]
    assert batch[3][2] and not batch[1][2]


def test_convert_service_over_sdb_stream_parity(spark, tmp_path):
    """The reference's flagship convert pipeline as one living test
    (init-sisdb.conf:288-298, r10 verdict #8): the S14 sdb_bars STREAM
    feeds ConvertService end-to-end — key-addressed .sdb feed files in,
    1-minute AND 1-day bars out through checkpointed parquet sinks,
    across a TWO-batch ingest with a restart between (file-set offsets
    resume; nothing reprocessed) — and every finalized bar equals the
    batch rollup of the same ticks, window for window."""
    from ago_sisdb_spark.sources import sdbfmt
    from ago_sisdb_spark.streaming.convert import ConvertService

    sdbfmt.register(spark)
    feed = tmp_path / "feed"
    feed.mkdir()
    base = str(tmp_path / "bars")

    def us(day, h, m, s):
        return int(datetime(2024, 1, day, h, m, s).timestamp() * 1_000_000)

    def ticks(sym, day, n, p0):
        # one tick every 20s from 09:30:00; prices vary so open/close
        # tie-breaks (min_by/max_by on event time) are observable
        return [
            (sym, us(day, 9, 30, 0) + i * 20_000_000,
             p0, p0 + 2.0, p0 - 1.0, p0 + float(i), 10 + i)
            for i in range(n)
        ]

    batch1 = ticks("AAA", 5, 7, 10.0) + ticks("BBB", 5, 4, 50.0)
    batch2 = ticks("AAA", 6, 5, 20.0) + ticks("BBB", 6, 6, 60.0)
    # two flush ticks on days 7 and 8: the watermark a batch EMITS under
    # comes from the PREVIOUS batch's max event time, so finalizing every
    # day-5/6 window takes one batch to advance the watermark past day 6
    # and a SECOND batch (with data — a no-new-data run never executes a
    # micro-batch under availableNow) to evict under the advanced mark
    flush = [("AAA", us(7, 9, 30, 0), 1.0, 1.0, 1.0, 1.0, 1)]
    flush2 = [("AAA", us(8, 9, 30, 0), 1.0, 1.0, 1.0, 1.0, 1)]

    svc_conf = {
        "key": ["symbol"],
        "time": "ts",
        "price": "close",
        "volume": "volume",
        "convert": [
            {"width": "1 minute", "sink": "sdbmin", "watermark": "0 seconds"},
            {"width": "1 day", "sink": "sdbday", "watermark": "0 seconds"},
        ],
    }

    def run_service():
        svc = ConvertService.from_config(svc_conf)
        stream = (
            spark.readStream.format("sdb_bars")
            .load(str(feed))
            .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        )
        svc.start_to_parquet(stream, base)
        svc.await_all()
        svc.stop_all()

    sdbfmt.write_sdb_file(str(feed / "AAA.sdb"), [r for r in batch1 if r[0] == "AAA"])
    sdbfmt.write_sdb_file(str(feed / "BBB.sdb"), [r for r in batch1 if r[0] == "BBB"])
    run_service()

    sdbfmt.write_sdb_file(str(feed / "AAA.part2.sdb"), [r for r in batch2 if r[0] == "AAA"])
    sdbfmt.write_sdb_file(str(feed / "BBB.part2.sdb"), [r for r in batch2 if r[0] == "BBB"])
    run_service()  # restart from checkpoints: only the new files ingest

    sdbfmt.write_sdb_file(str(feed / "AAA.part3.sdb"), flush)
    run_service()  # flush tick processed (still under the day-6 watermark)
    sdbfmt.write_sdb_file(str(feed / "AAA.part4.sdb"), flush2)
    run_service()  # evicts every day-5/6 window under the day-7 watermark

    # batch twin: the SAME rollup semantics over all real ticks at once
    all_ticks = spark.createDataFrame(
        batch1 + batch2,
        "symbol string, ts_us long, open double, high double, "
        "low double, close double, volume long",
    ).withColumn("ts", F.timestamp_micros(F.col("ts_us")))

    def batch_bars(width):
        return (
            all_ticks.groupBy("symbol", F.window("ts", width))
            .agg(
                F.min_by("close", "ts").alias("open"),
                F.max("close").alias("high"),
                F.min("close").alias("low"),
                F.max_by("close", "ts").alias("close"),
                F.count(F.lit(1)).alias("volume"),
                F.sum("volume").alias("money"),
            )
            .select(
                "symbol", F.col("window.start").alias("bar_start"),
                "open", "high", "low", "close", "volume", "money",
            )
        )

    for sink, width in (("sdbmin", "1 minute"), ("sdbday", "1 day")):
        got = {
            (r.symbol, str(r.bar_start)): r
            for r in spark.read.parquet(f"{base}/{sink}")
            .where(F.col("bar_start") < "2024-01-07")  # flush tick excluded
            .collect()
        }
        want = {
            (r.symbol, str(r.bar_start)): r for r in batch_bars(width).collect()
        }
        assert set(got) == set(want), (sink, set(got) ^ set(want))
        for k, w in want.items():
            g = got[k]
            assert (g.open, g.high, g.low, g.close, g.volume, g.money) == (
                w.open, w.high, w.low, w.close, w.volume, w.money
            ), (sink, k)
    # two-batch day bars: one per symbol per day, none duplicated by the
    # restart (exactly-once file offsets + append-once finalization)
    day_rows = spark.read.parquet(f"{base}/sdbday").where(
        F.col("bar_start") < "2024-01-07"
    )
    assert day_rows.count() == 4
