"""Rows-only pandas-UDF operators validated against local models:
distributed polyfit == numpy.polyfit on collected data; turning points ==
a straight Python re-implementation."""

from __future__ import annotations

import numpy as np
import pytest

from ago_sisdb_spark.operators.series import polyfit_pandas, turning_points_pandas


@pytest.fixture(scope="module")
def curve(spark):
    rows = []
    for g, (a, b, c) in (("g1", (0.5, -2.0, 3.0)), ("g2", (-0.1, 1.0, 10.0))):
        for x in range(40):
            noise = ((x * 37) % 11 - 5) * 0.01  # deterministic pseudo-noise
            rows.append((g, float(x), a * x * x + b * x + c + noise))
    return spark.createDataFrame(rows, "grp string, x double, y double").repartition(4)


def test_polyfit_matches_numpy(spark, curve):
    got = {r.grp: (r.c2, r.c1, r.c0) for r in polyfit_pandas(
        curve, ["grp"], "x", "y", 2
    ).collect()}
    local = curve.toPandas()
    for g in ("g1", "g2"):
        pdf = local[local.grp == g]
        want = np.polyfit(pdf.x, pdf.y, 2)
        assert np.allclose(got[g], want, atol=1e-9), g


def test_polyfit_underdetermined_is_nan(spark):
    df = spark.createDataFrame([("g", 1.0, 1.0)], "grp string, x double, y double")
    r = polyfit_pandas(df, ["grp"], "x", "y", 2).collect()[0]
    # NaN doubles surface as None through Arrow
    assert all(v is None or np.isnan(v) for v in (r.c2, r.c1, r.c0))


def _turning_points_model(vals, times, min_rate):
    out = []
    if len(vals) < 3:
        return out
    last_turn, direction = 0, 0
    for i in range(1, len(vals)):
        d = 1 if vals[i] > vals[last_turn] else -1
        amp = abs(vals[i] - vals[last_turn]) / max(abs(vals[last_turn]), 1e-12)
        if direction == 0:
            if amp >= min_rate:
                direction = d
                last_turn = i
        elif d != direction and amp >= min_rate:
            out.append((times[last_turn], vals[last_turn], direction))
            direction = d
            last_turn = i
        elif d == direction and (
            (d > 0 and vals[i] > vals[last_turn])
            or (d < 0 and vals[i] < vals[last_turn])
        ):
            # same-direction extension: the turn anchor rides the extremum
            last_turn = i
    return out


def test_turning_points_matches_model(spark):
    # zig-zag with varying amplitudes
    vals = [10.0, 11.0, 12.0, 11.5, 10.0, 10.2, 13.0, 12.0, 9.0, 9.5, 14.0]
    rows = [("k", float(i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, t double, v double").repartition(3)
    got = [
        (r.turn_time, r.turn_value, r.direction)
        for r in turning_points_pandas(df, ["key"], "t", "v", 0.05)
        .orderBy("turn_time")
        .collect()
    ]
    want = _turning_points_model(vals, [float(i) for i in range(len(vals))], 0.05)
    assert got == want
    assert len(got) > 0  # the zig-zag must produce turns


def test_turning_points_prefilter_exact(spark):
    """The extrema prefilter must be a pure optimization: identical output
    to the unfiltered scan on random series with plateaus, sign changes,
    and varying amplitudes (the prefilter-correctness property the operator
    docstring claims)."""
    import random

    rnd = random.Random(17)
    rows = []
    for key in ("a", "b", "c"):
        v = 10.0
        for i in range(400):
            step = rnd.choice([0.0, 0.0, -1.0, 1.0]) * rnd.random() * 3.0
            v = v + step
            if rnd.random() < 0.02:
                v = -v  # sign flips stress the abs() in the amplitude
            rows.append((key, float(i), round(v, 6)))
    df = spark.createDataFrame(rows, "key string, t double, v double").repartition(7)
    kwargs = dict(keys=["key"], time_col="t", col="v", min_rate=0.03)
    full = sorted(
        map(tuple, turning_points_pandas(df, prefilter=False, **kwargs).collect())
    )
    fast = sorted(
        map(tuple, turning_points_pandas(df, prefilter=True, **kwargs).collect())
    )
    assert full == fast
    assert len(full) > 10  # the series actually produced turns


def test_turning_points_prefilter_shrinks_input(spark):
    """Monotone + plateau series collapse to almost nothing before pandas."""
    rows = [("k", float(i), float(i // 10)) for i in range(1000)]
    df = spark.createDataFrame(rows, "key string, t double, v double")
    out = turning_points_pandas(df, ["key"], "t", "v", 0.05)
    assert out.count() == 0  # monotone → no turns, with or without filter
