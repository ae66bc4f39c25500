"""T5/T8/T9 write-path semantics: per-scale same-timestamp rules, upsert,
delete — SURVEY §7 hard part (b)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ago_sisdb_spark.streaming.write import TimeScale, delete_range, delete_where, upsert


def _cur(spark):
    return spark.createDataFrame(
        [("A", 1, 10.0), ("A", 2, 20.0), ("B", 1, 100.0)],
        "sym string, t int, v double",
    )


def test_append_scale_keeps_duplicates(spark):
    incoming = spark.createDataFrame([("A", 2, 21.0)], "sym string, t int, v double")
    out = upsert(_cur(spark), incoming, ["sym"], "t", TimeScale.MILLI)
    assert out.count() == 4  # µs/ms: same-time rows append


def test_overwrite_scale_replaces_same_time(spark):
    incoming = spark.createDataFrame(
        [("A", 2, 21.0), ("C", 7, 70.0)], "sym string, t int, v double"
    )
    out = upsert(_cur(spark), incoming, ["sym"], "t", TimeScale.DAY)
    got = {(r.sym, r.t): r.v for r in out.collect()}
    assert got == {
        ("A", 1): 10.0,
        ("A", 2): 21.0,  # overwritten
        ("B", 1): 100.0,
        ("C", 7): 70.0,  # inserted
    }


def test_overwrite_dedups_incoming_batch(spark):
    incoming = spark.createDataFrame(
        [("A", 2, 21.0), ("A", 2, 22.0)], "sym string, t int, v double"
    )
    out = upsert(_cur(spark), incoming, ["sym"], "t", TimeScale.MINUTE)
    assert out.where("sym='A' and t=2").count() == 1


def test_delete_range(spark):
    out = delete_range(_cur(spark), F.col("sym") == "A", "t", start=2, stop=2)
    got = sorted((r.sym, r.t) for r in out.collect())
    assert got == [("A", 1), ("B", 1)]


def test_delete_where(spark):
    out = delete_where(_cur(spark), F.col("v") >= 20.0)
    assert sorted(r.sym for r in out.collect()) == ["A"]


def test_upsert_property_matches_dict_model(spark):
    """Property: overwrite-scale upsert == the naive dict model
    {(key, t): last-write} for arbitrary batches."""
    import random

    rnd = random.Random(11)
    syms = ["A", "B", "C"]
    current_rows = [
        (rnd.choice(syms), rnd.randrange(5), float(rnd.randrange(100)))
        for _ in range(30)
    ]
    # current state must itself be unique per (sym, t): collapse first
    model = {}
    for s, t, v in current_rows:
        model[(s, t)] = v
    cur = spark.createDataFrame(
        [(s, t, v) for (s, t), v in model.items()], "sym string, t int, v double"
    )
    for _ in range(3):
        batch = [
            (rnd.choice(syms), rnd.randrange(5), float(rnd.randrange(100)))
            for _ in range(10)
        ]
        inc = spark.createDataFrame(batch, "sym string, t int, v double")
        # dropDuplicates keeps an arbitrary row per key; mirror by applying
        # a deterministic max-value pick on both sides
        inc = (
            inc.groupBy("sym", "t").agg(F.max("v").alias("v"))
        )
        for s, t, v in batch:
            prev = max(x[2] for x in batch if (x[0], x[1]) == (s, t))
            model[(s, t)] = prev
        cur = upsert(cur, inc, ["sym"], "t", TimeScale.DAY)
    got = {(r.sym, r.t): r.v for r in cur.collect()}
    assert got == model
