"""P6 last-per-key: agg (max_by) and window strategies must agree."""

from __future__ import annotations

from pyspark.sql import functions as F

from ago_sisdb_spark.operators import lastper


def _df(spark):
    rows = [
        ("A", 1, 10.0),
        ("A", 3, 30.0),
        ("A", 2, 20.0),
        ("B", 5, 50.0),
        ("B", 4, 40.0),
        ("C", 9, 90.0),
    ]
    return spark.createDataFrame(rows, "sym string, t int, v double")


def test_last_per_key_max_by(spark):
    out = lastper.last_per_key(_df(spark), ["sym"], "t")
    got = {r.sym: (r.t, r.v) for r in out.collect()}
    assert got == {"A": (3, 30.0), "B": (5, 50.0), "C": (9, 90.0)}


def test_strategies_agree(spark):
    df = _df(spark)
    a = lastper.last_per_key(df, ["sym"], "t")
    b = lastper.last_per_key_window(df, ["sym"], [F.col("t")])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_topk_per_key(spark):
    out = lastper.topk_per_key(_df(spark), ["sym"], [F.col("t").desc()], 2)
    got = sorted((r.sym, r.t) for r in out.collect())
    assert got == [("A", 2), ("A", 3), ("B", 4), ("B", 5), ("C", 9)]
