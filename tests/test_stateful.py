"""applyInPandasWithState: per-key incremental stats accumulate across
micro-batches (the reference's s_ai_avg_m objects, stream-native)."""

from __future__ import annotations

import math


def test_running_stats_across_microbatches(spark, tmp_path):
    from ago_sisdb_spark.streaming.stateful import running_stats

    src = str(tmp_path / "src")
    schema = "key string, value double"
    # two files → two micro-batches with maxFilesPerTrigger=1
    spark.createDataFrame(
        [("A", 1.0), ("A", 2.0), ("B", 10.0)], schema
    ).write.parquet(src)
    spark.createDataFrame(
        [("A", 3.0), ("B", 20.0)], schema
    ).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        running_stats(stream, "key", "value")
        .writeStream.format("memory")
        .queryName("rs_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()

    # last emitted state per key is the full-history aggregate
    rows = spark.sql(
        "select * from rs_test"
    ).collect()
    latest = {}
    for r in rows:  # n is monotone per key → max-n row is the final state
        if r.key not in latest or r.n > latest[r.key].n:
            latest[r.key] = r
    a, b = latest["A"], latest["B"]
    assert a.n == 3 and abs(a.mean - 2.0) < 1e-12 and a.last == 3.0
    assert abs(a.m2 / (a.n - 1) - 1.0) < 1e-12  # sample var of 1,2,3
    assert b.n == 2 and abs(b.mean - 15.0) < 1e-12 and b.last == 20.0
    assert math.isclose(b.m2 / (b.n - 1), 50.0)
