"""Salted aggregation / join must be result-identical to the plain forms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ago_sisdb_spark.operators.skew import salted_agg, salted_broadcast_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90% of rows) + a long tail
    hot = [("HOT", i, float(i % 7)) for i in range(900)]
    tail = [(f"K{i%37}", i, float(i)) for i in range(100)]
    return spark.createDataFrame(hot + tail, "k string, seq int, v double").repartition(8)


def test_salted_agg_matches_plain(spark, skewed):
    plain = {
        (r.k): (r.s, r.n, r.mn, r.mx)
        for r in skewed.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.k): (r.s, r.n, r.mn, r.mx)
        for r in salted_agg(
            skewed,
            ["k"],
            {"s": ("sum", "v"), "n": ("count", "v"), "mn": ("min", "v"), "mx": ("max", "v")},
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_non_algebraic(spark, skewed):
    with pytest.raises(ValueError):
        salted_agg(skewed, ["k"], {"m": ("median", "v")})


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("HOT", "hot-dim")] + [(f"K{i}", f"dim{i}") for i in range(37)],
        "k string, label string",
    )
    plain = sorted(
        (r.k, r.seq, r.label) for r in skewed.join(dim, ["k"]).collect()
    )
    salted = sorted(
        (r.k, r.seq, r.label)
        for r in salted_broadcast_join(skewed, dim, ["k"], n_salts=8).collect()
    )
    assert salted == plain


def test_salted_left_join_keeps_unmatched(spark, skewed):
    dim = spark.createDataFrame([("HOT", "hot-dim")], "k string, label string")
    out = salted_broadcast_join(skewed, dim, ["k"], how="left", n_salts=4)
    assert out.count() == skewed.count()
    assert out.where(F.col("label").isNull()).count() == 100
