"""U1-U4 extension surface: expression-method dispatch + registered
pandas UDFs."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ago_sisdb_spark.functions.registry import call, register_udfs


def test_call_dispatch(spark):
    df = spark.createDataFrame([(2.0, 4.0), (3.0, 0.0)], "a double, b double")
    out = df.select(
        call("zero_safe_div", F.col("a"), F.col("b")).alias("d"),
        call("zoom10", F.col("a"), 3).alias("z"),
        call("logistic", F.lit(0.0)).alias("l"),
    ).collect()
    assert out[0].d == 0.5 and out[1].d is None  # zero-safe
    assert out[0].z == 2000.0
    assert out[0].l == 0.5


def test_call_unknown_raises(spark):
    with pytest.raises(KeyError):
        call("nope")


def test_registered_pandas_udfs(spark):
    names = register_udfs(spark)
    assert set(names) == {"sis_logistic", "sis_fib_weight", "sis_geomean"}
    row = spark.sql(
        "SELECT sis_logistic(0.0) AS l, sis_fib_weight(10.0) AS f"
    ).first()
    assert row.l == 0.5
    assert row.f == 55.0  # fib(10)


def test_fib_weight_matches_recurrence(spark):
    register_udfs(spark)
    got = [
        r.f
        for r in spark.sql(
            "SELECT sis_fib_weight(CAST(id AS DOUBLE)) AS f FROM range(1, 16)"
        ).collect()
    ]
    fib = [1, 1]
    while len(fib) < 15:
        fib.append(fib[-1] + fib[-2])
    assert got == [float(x) for x in fib]


def test_logistic_expression_matches_python(spark):
    vals = [-3.0, -0.5, 0.0, 0.5, 3.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r[0] for r in df.select(call("logistic", F.col("x"))).collect()]
    want = [1.0 / (1.0 + math.exp(-v)) for v in vals]
    assert all(abs(a - b) < 1e-12 for a, b in zip(got, want))


def test_no_unpartitioned_window_specs_in_source():
    """Static guard (r6 verdict #2): no production code may build a window
    spec that starts with a global orderBy — `Window.orderBy(...)` (or a
    `W.orderBy` alias) funnels the whole frame through one partition.
    Every global ranking need has a scale-safe helper now:
    lastper.topk_global (top-k + rank), lastper.global_rank (whole-frame
    rank), or a collect_list→array_sort aggregate for bounded series.
    partitionBy(F.lit(0)) is equally banned — Catalyst strips foldable
    partition keys, so it IS the global window it pretends not to be."""
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parent.parent / "ago_sisdb_spark"
    bad = []
    for f in root.rglob("*.py"):
        src = f.read_text()
        for pat in (r"\bWindow\.orderBy\(", r"\bW\.orderBy\(",
                    r"partitionBy\(F\.lit\("):
            for m in re.finditer(pat, src):
                line = src[: m.start()].count("\n") + 1
                bad.append(f"{f.relative_to(root.parent)}:{line}")
    assert not bad, f"global window specs found: {bad}"
