"""§2.4 A3-A14 — series math queries (reference `src/core/ai/sis_ai.h`).

Each query applies the operators in ``operators/series.py`` to the `events`
series (per event_type = per key, ordered by event_id which is globally
time-ordered in the test data).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ago_sisdb_spark.inventory import _t, query
from ago_sisdb_spark.operators import lastper, series

GOLDEN_SQL = "((1 + sqrt(5)) / 2)"


@query(
    "a3_mean_median",
    oracle="""
    SELECT event_type, round(avg(value), 6) AS mean_value,
           round(median(value), 6) AS median_value
    FROM events GROUP BY event_type
    """,
    extended=True,
)
def a3_mean_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: avg+median (sis_ai_get_avg_and_mid, sis_ai.h:45). Exact median
    (interpolated) matches DuckDB; at 100 TB swap to approx_percentile."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.avg("value"), 6).alias("mean_value"),
            F.round(F.median("value"), 6).alias("median_value"),
        )
    )


@query(
    "a4_variance",
    oracle="""
    SELECT event_type, round(avg(value), 6) AS mean_value,
           round(var_samp(value), 6) AS var_value,
           round(stddev_samp(value), 6) AS std_value
    FROM events GROUP BY event_type
    """,
    extended=True,
)
def a4_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: sample mean+variance (sis_ai_series_argv, sis_ai.h:138)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.avg("value"), 6).alias("mean_value"),
            F.round(F.var_samp("value"), 6).alias("var_value"),
            F.round(F.stddev_samp("value"), 6).alias("std_value"),
        )
    )


@query(
    "a5_normal_density",
    oracle="""
    SELECT event_type,
           round(exp(-pow(50.0 - avg(value), 2) / (2 * var_samp(value)))
                 / sqrt(2 * pi() * var_samp(value)), 6) AS chance_at_50
    FROM events GROUP BY event_type
    """,
    extended=True,
)
def a5_normal_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 'chance': density of x=50 under per-group (mu, var) (sis_ai.h:140)."""
    ev = _t(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.var_samp("value").alias("s2")
    )
    return g.select(
        "event_type",
        F.round(
            series.normal_density(F.lit(50.0), F.col("mu"), F.col("s2")), 6
        ).alias("chance_at_50"),
    )


@query(
    "a6_correlation",
    oracle="""
    SELECT l_returnflag, round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr
    FROM lineitem GROUP BY l_returnflag
    """,
    extended=True,
)
def a6_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: Pearson correlation (sis_ai_corr.h:15-25)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"))
    )


@query(
    "a6_lagged_corr",
    oracle="""
    WITH lagged AS (
        SELECT event_type, value,
               lag(value, 1) OVER (PARTITION BY event_type ORDER BY event_id) AS prev_value
        FROM events)
    SELECT event_type, round(corr(value, prev_value), 6) AS autocorr_1
    FROM lagged GROUP BY event_type
    """,
    extended=True,
)
def a6_lagged_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 offset-corr: lag-1 autocorrelation per series (sis_ai_corr.h:20-25)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("event_id")
    lagged = ev.select(
        "event_type", "value", F.lag("value", 1).over(w).alias("prev_value")
    )
    return lagged.groupBy("event_type").agg(
        F.round(F.corr("value", "prev_value"), 6).alias("autocorr_1")
    )


@query(
    "a7_regr_slope",
    oracle="""
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept
    FROM lineitem GROUP BY l_returnflag
    """,
    extended=True,
)
def a7_regr_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: least-squares slope (sis_ai.h:135-136)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
            F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 6).alias(
                "intercept"
            ),
        )
    )


@query(
    "a9_drift",
    oracle="""
    WITH d AS (
        SELECT event_type, event_id, value,
               value - lag(value, 1) OVER (PARTITION BY event_type ORDER BY event_id) AS d1
        FROM events),
    dd AS (
        SELECT event_type, event_id, d1,
               d1 - lag(d1, 1) OVER (PARTITION BY event_type ORDER BY event_id) AS d2
        FROM d)
    SELECT event_type, round(avg(d1), 6) AS mean_drift,
           round(avg(d2), 6) AS mean_accel,
           round(max_by(d1, event_id), 6) AS last_drift
    FROM dd GROUP BY event_type
    """,
)
def a9_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: drift/acceleration via lag differences (sis_ai.h:35-37)."""
    ev = _t(spark, sf_dir, "events").select("event_type", "event_id", "value")
    d = series.drift(ev, ["event_type"], [F.col("event_id")], "value")
    return d.groupBy("event_type").agg(
        F.round(F.avg("d1"), 6).alias("mean_drift"),
        F.round(F.avg("d2"), 6).alias("mean_accel"),
        F.round(F.max_by("d1", "event_id"), 6).alias("last_drift"),
    )


@query(
    "a10_minmax_norm",
    oracle="""
    SELECT event_id, event_type,
           round((value - min(value) OVER (PARTITION BY event_type))
                 / nullif(max(value) OVER (PARTITION BY event_type)
                          - min(value) OVER (PARTITION BY event_type), 0), 6) AS norm_value
    FROM events
    """,
    extended=True,
)
def a10_minmax_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: min-max normalization per series (sis_ai.h:22-33)."""
    ev = _t(spark, sf_dir, "events")
    norm = series.minmax_normalize(ev, ["event_type"], "value")
    return ev.select(
        "event_id", "event_type", F.round(norm, 6).alias("norm_value")
    )


@query(
    "a11_fib_weighted_mean",
    oracle=f"""
    WITH ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
    SELECT event_type,
           round(sum(value * pow({GOLDEN_SQL}, 20 - rn))
                 / sum(pow({GOLDEN_SQL}, 20 - rn)), 6) AS fib_wmean
    FROM ranked WHERE rn <= 20 GROUP BY event_type
    """,
    extended=True,
)
def a11_fib_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: Fibonacci/golden-ratio recency-weighted mean of the last 20
    records per series (sis_ai.h:142)."""
    ev = _t(spark, sf_dir, "events")
    out = series.fib_weighted_mean(
        ev, ["event_type"], [F.col("ts"), F.col("event_id")], "value", 20
    )
    return out.select("event_type", F.round("fib_wmean", 6).alias("fib_wmean"))


@query(
    "a12_running_avg",
    oracle="""
    SELECT event_id, event_type,
           round(avg(value) OVER (PARTITION BY event_type ORDER BY event_id
                                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS run_avg
    FROM events
    """,
)
def a12_running_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: trailing-5 running average with warmup (sis_ai.h:46-64)."""
    ev = _t(spark, sf_dir, "events")
    ra = series.running_avg(ev, ["event_type"], [F.col("event_id")], "value", 5)
    return ev.select("event_id", "event_type", F.round(ra, 6).alias("run_avg"))


@query(
    "a13_trend_code",
    oracle="""
    WITH coded AS (
        SELECT event_type,
               CAST(value > lag(value, 1) OVER w AS INTEGER)
             + CAST(value > lag(value, 2) OVER w AS INTEGER) * 2
             + CAST(value > lag(value, 3) OVER w AS INTEGER) * 4 AS trend_code
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY event_id))
    SELECT event_type, trend_code, count(*) AS n
    FROM coded WHERE trend_code IS NOT NULL
    GROUP BY event_type, trend_code
    """,
    extended=True,
)
def a13_trend_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: 3-period up/down pattern code distribution (sis_ai.h:180-280)."""
    ev = _t(spark, sf_dir, "events").select("event_type", "event_id", "value")
    code = series.trend_code(ev, ["event_type"], [F.col("event_id")], "value")
    return (
        ev.withColumn("trend_code", code)
        .where(F.col("trend_code").isNotNull())
        .groupBy("event_type", "trend_code")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "a14_local_extrema",
    oracle="""
    WITH n AS (
        SELECT event_type, value,
               lag(value) OVER w AS prev, lead(value) OVER w AS nxt
        FROM events WINDOW w AS (PARTITION BY event_type ORDER BY event_id))
    SELECT event_type,
           CAST(sum(CASE WHEN value > prev AND value > nxt THEN 1 ELSE 0 END) AS BIGINT) AS n_peaks,
           CAST(sum(CASE WHEN value < prev AND value < nxt THEN 1 ELSE 0 END) AS BIGINT) AS n_troughs
    FROM n GROUP BY event_type
    """,
    extended=True,
)
def a14_local_extrema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 relational core: local extrema counts per series (sis_ai.h:66-112)."""
    ev = _t(spark, sf_dir, "events").select("event_type", "event_id", "value")
    marked = series.local_extrema(ev, ["event_type"], [F.col("event_id")], "value")
    return marked.groupBy("event_type").agg(
        F.sum(F.col("is_peak").cast("int")).alias("n_peaks"),
        F.sum(F.col("is_trough").cast("int")).alias("n_troughs"),
    )


@query(
    "a14_turning_points",
    oracle="""
    WITH n AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
    r AS (SELECT event_type, unnest(range(2, n)) AS rn FROM n)
    SELECT event_type, CAST(rn AS BIGINT) AS turn_rn,
           CAST(CASE WHEN (rn - 1) % 8 = 4 THEN 4.0 ELSE 0.0 END AS DOUBLE)
               AS turn_value,
           CAST(CASE WHEN (rn - 1) % 8 = 4 THEN 1 ELSE -1 END AS INTEGER)
               AS direction
    FROM r WHERE (rn - 1) % 4 = 0
    """,
    extended=True,
)
def a14_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 full stateful turning-point scan (sis_ai.h:66-112) — per-key
    Arrow-batched applyInPandas, hash-checked since r6 via a planted
    triangle wave (r5 verdict #3): per event_type the value at in-group
    rank rn is 4 − |((rn−1) mod 8) − 4| — a 0..4..0 zig-zag — so the REAL
    scan (window prefilter + pandas state machine, the exact production
    code path) provably emits every interior extremum: rank 1's trough is
    consumed establishing direction, the final row can't be confirmed by
    a reversal, and everything between — (rn−1) mod 4 = 0, 2 ≤ rn ≤ n−1 —
    turns with direction +1 at peaks (value 4) and −1 at troughs (0).
    The oracle states that closed form; any state-machine or prefilter
    bug breaks the hash.  Complements ``a14_turning_scan_planted`` (100-
    base wave, amp gate ratio 0.071 near the 0.05 threshold) with a
    zero-baseline trough that exercises the ``amp/max(|v|,1e-12)`` guard.
    Real-data parity (incl. the per-day chunked form and
    prefilter==full-scan) stays property-pinned in
    tests/test_series_pandas.py."""
    w = Window.partitionBy("event_type").orderBy("event_id")
    pos = (F.row_number().over(w) - 1) % 8
    planted = _t(spark, sf_dir, "events").select(
        "event_type",
        F.row_number().over(w).cast("long").alias("rn"),
        (F.lit(4) - F.abs(pos - 4)).cast("double").alias("v"),
    )
    out = series.turning_points_pandas(planted, ["event_type"], "rn", "v", 0.05)
    return out.select(
        "event_type",
        F.col("turn_time").alias("turn_rn"),
        "turn_value",
        "direction",
    )


@query("a8_polyfit", oracle=None, extended=True)
def a8_polyfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: degree-2 polyfit of value over time per series (sis_ai.h:131-133)
    via numpy in applyInPandas; rows-only check."""
    ev = (
        _t(spark, sf_dir, "events")
        .select("event_type", F.col("event_id").cast("double").alias("x"), "value")
    )
    return series.polyfit_pandas(ev, ["event_type"], "x", "value", 2)


@query(
    "a8_polyfit_planted",
    oracle="""
    SELECT event_type,
           CAST(length(event_type) + 2 AS DOUBLE) AS c2,
           CAST(length(event_type) + 1 AS DOUBLE) AS c1,
           CAST(length(event_type) AS DOUBLE) AS c0
    FROM (SELECT DISTINCT event_type FROM events)
    """,
    extended=True,
)
def a8_polyfit_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 oracle twin (r3 verdict #5): the same numpy polyfit operator run
    on a planted exact quadratic — per event_type, y = (L+2)x² + (L+1)x + L
    with L = len(event_type), x = event_id mod 101 — so the recovered
    coefficients are known integers and DuckDB states them in closed form.
    Zero-residual input makes the least-squares solution exact up to
    float noise ≪ the 6-decimal rounding.  The real-data run stays in
    ``a8_polyfit`` (rows-only by contract)."""
    ev = _t(spark, sf_dir, "events").select("event_type", "event_id")
    code = F.length("event_type").cast("double")
    x = (F.col("event_id") % 101).cast("double")
    planted = ev.select(
        "event_type",
        x.alias("x"),
        ((code + 2) * x * x + (code + 1) * x + code).alias("y"),
    )
    out = series.polyfit_pandas(planted, ["event_type"], "x", "y", 2)
    return out.select(
        "event_type",
        F.round("c2", 6).alias("c2"),
        F.round("c1", 6).alias("c1"),
        F.round("c0", 6).alias("c0"),
    )


@query(
    "a14_turning_scan_planted",
    oracle="""
    WITH ranked AS (
        SELECT event_type,
               row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS idx,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    )
    SELECT event_type,
           CAST(idx AS DOUBLE) AS turn_time,
           CAST(CASE WHEN idx % 8 = 0 THEN 140 ELSE 100 END AS DOUBLE) AS turn_value,
           CAST(CASE WHEN idx % 8 = 0 THEN 1 ELSE -1 END AS INTEGER) AS direction
    FROM ranked
    WHERE idx % 8 IN (0, 4) AND idx < n
    """,
    extended=True,
)
def a14_turning_scan_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 oracle twin (r3 verdict #5): the same stateful applyInPandas
    turning-point scan run on a planted triangle wave — per event_type,
    value = 100 + 10·|idx mod 8 − 4| over idx = rank by event_id — whose
    turning points have a closed form: every trough (idx≡4 mod 8, value
    100, direction −1) and peak (idx≡0, value 140, direction +1) except
    the series' last point (a turn is only confirmed by the following
    direction flip; every step here clears the 0.05 amplitude gate:
    10/140 ≈ 0.071).  The real-data scan stays in ``a14_turning_points``
    (rows-only by contract)."""
    ev = _t(spark, sf_dir, "events").select("event_type", "event_id")
    idx = F.row_number().over(
        Window.partitionBy("event_type").orderBy("event_id")
    )
    planted = ev.select(
        "event_type",
        idx.cast("double").alias("t"),
        (F.lit(100.0) + F.lit(10.0) * F.abs((idx % 8) - F.lit(4)).cast("double")).alias("val"),
    )
    out = series.turning_points_pandas(planted, ["event_type"], "t", "val", 0.05)
    return out.select("event_type", "turn_time", "turn_value", "direction")


@query(
    # r12 driver rotation (r11 verdict #7): demoted to extended under a
    # NEW name; the same-named driver umbrella in combined.py unions this
    # core window surface with the w3/w4/w5 event-sequence branches
    # (umbrella-rotation mechanics — see CLAUDE.md).
    "w1_core",
    oracle="""
    SELECT event_id, user_id, value,
           rank()       OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk,
           dense_rank() OVER (PARTITION BY user_id ORDER BY event_type) AS drnk,
           lag(value)   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           lead(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_sum3,
           CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS quartile,
           round(percent_rank() OVER (PARTITION BY user_id ORDER BY value, event_id), 6) AS pct_rnk,
           round(cume_dist() OVER (PARTITION BY user_id ORDER BY value, event_id), 6) AS cdist,
           first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS first_val,
           nth_value(value, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_val
    FROM events WHERE user_id < 20
    """,
    extended=True,
)
def w1_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 declared window surface in one plan: rank/dense_rank, lag/lead
    (the reference's offset:-n record addressing, sisdb_fmap.h:156-158), a
    rowsBetween frame, and (r4) the distribution family — ntile quartiles,
    percent_rank, cume_dist, first/nth_value.  All windows share the
    user_id partitioning — one shuffle, multiple sorts."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").where(F.col("user_id") < 20)
    by_time = Window.partitionBy("user_id").orderBy("ts", "event_id")
    by_value = Window.partitionBy("user_id").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.rank()
        .over(Window.partitionBy("user_id").orderBy(F.col("value").desc(), "event_id"))
        .cast("bigint").alias("rnk"),
        F.dense_rank()
        .over(Window.partitionBy("user_id").orderBy("event_type"))
        .cast("bigint").alias("drnk"),
        F.lag("value").over(by_time).alias("prev_value"),
        F.lead("value").over(by_time).alias("next_value"),
        F.round(
            F.sum("value").over(by_time.rowsBetween(-2, 0)), 6
        ).alias("moving_sum3"),
        F.ntile(4).over(by_time).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(by_value), 6).alias("pct_rnk"),
        F.round(F.cume_dist().over(by_value), 6).alias("cdist"),
        F.first("value").over(by_time).alias("first_val"),
        F.nth_value("value", 2)
        .over(by_time.rowsBetween(Window.unboundedPreceding, 0))
        .alias("second_val"),
    )


@query(
    "a12_ewma",
    oracle="""
    SELECT user_id,
           round(list_reduce(list(value ORDER BY ts, event_id),
                 (acc, x) -> acc * 0.9 + x * 0.1), 6) AS ewma
    FROM events WHERE user_id < 30
    GROUP BY user_id
    """,
    extended=True,
)
def a12_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12-family: exponentially-weighted moving average per key (α=0.1) —
    the recency-weighted running average family (sis_ai.h:46-64, A11's
    Fibonacci weighting generalized).  One groupBy; the fold runs as a
    codegen'd `aggregate` over the sorted per-key series (series must fit
    the array limit per key — same bound as any collect_list window)."""
    ev = _t(spark, sf_dir, "events").where(F.col("user_id") < 30)
    series_arr = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "value"))
    )
    fold = F.aggregate(
        series_arr,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x["value"]).otherwise(
            acc * 0.9 + x["value"] * 0.1
        ),
    )
    return ev.groupBy("user_id").agg(F.round(fold, 6).alias("ewma"))


@query(
    "a6_directional_corr",
    oracle="""
    WITH d AS (
        SELECT date_trunc('day', ts) AS day,
               avg(CASE WHEN event_type = 'click'    THEN value END) AS x,
               avg(CASE WHEN event_type = 'purchase' THEN value END) AS y
        FROM events GROUP BY 1),
    s AS (
        SELECT sign(x - lag(x) OVER (ORDER BY day)) AS dx,
               sign(y - lag(y) OVER (ORDER BY day)) AS dy
        FROM d)
    SELECT round(corr(dx, dy), 6) AS dir_corr,
           CAST(count(*) FILTER (dx = dy) AS BIGINT) AS n_same_dir,
           CAST(count(*) FILTER (dx IS NOT NULL AND dy IS NOT NULL) AS BIGINT)
               AS n_days
    FROM s
    """,
    extended=True,
)
def a6_directional_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 directional correlation (sis_ai_corr.h:15-25): correlate the
    *direction* of day-over-day moves of two series (sign of deltas), which
    is what the reference's 方向 corr measures — robust to magnitude."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.avg(F.when(F.col("event_type") == "click", F.col("value"))).alias("x"),
        F.avg(F.when(F.col("event_type") == "purchase", F.col("value"))).alias("y"),
    )
    # the day-over-day lag runs over the DAY-aggregated series (one row
    # per calendar day — bounded by the time span, not the event volume),
    # so instead of an unpartitioned lag window (WindowExec funnel + its
    # warning, r6 verdict #2) the whole series is collected into ONE
    # sorted array by a partial-combined aggregate and the deltas come
    # from zip_with over the array against itself shifted by one — the
    # lambda is inner-only (safe; see similarity.py) and each slice is a
    # materialized column, not re-evaluated per element
    arr = d.agg(
        F.array_sort(F.collect_list(F.struct("day", "x", "y"))).alias("__a")
    )
    # greatest(..., 0): slice() raises on a negative length, so an empty
    # or single-day series (size(__a) <= 1) must degrade to zero pairs,
    # matching the old lag-window form's NULL-corr row
    pairs = arr.select(
        F.zip_with(
            F.expr("slice(__a, 2, greatest(size(__a) - 1, 0))"),
            F.expr("slice(__a, 1, greatest(size(__a) - 1, 0))"),
            lambda cur, prev: F.struct(
                F.signum(cur["x"] - prev["x"]).alias("dx"),
                F.signum(cur["y"] - prev["y"]).alias("dy"),
            ),
        ).alias("__d")
    )
    s = pairs.select(F.explode("__d").alias("__s")).select(
        F.col("__s.dx").alias("dx"), F.col("__s.dy").alias("dy")
    )
    return s.agg(
        F.round(F.corr("dx", "dy"), 6).alias("dir_corr"),
        F.count(F.when(F.col("dx") == F.col("dy"), 1)).alias("n_same_dir"),
        F.count(
            F.when(F.col("dx").isNotNull() & F.col("dy").isNotNull(), 1)
        ).alias("n_days"),
    )


@query(
    "a18_mad_outliers",
    oracle="""
    WITH med AS (
        SELECT event_type, median(value) AS med FROM events GROUP BY event_type),
    dev AS (
        SELECT e.event_type, e.value, med.med, abs(e.value - med.med) AS adev
        FROM events e JOIN med USING (event_type)),
    mad AS (
        SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type)
    SELECT d.event_type, count(*) AS n,
           round(any_value(d.med), 6) AS med,
           round(any_value(m.mad), 6) AS mad,
           CAST(sum(CASE WHEN m.mad > 0 AND d.adev > 3.0 * 1.4826 * m.mad
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(avg(CASE WHEN m.mad > 0 AND d.adev > 3.0 * 1.4826 * m.mad
                    THEN 1.0 ELSE 0.0 END), 6) AS outlier_frac
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
    extended=True,
)
def a18_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly screen per event type (operators/series.mad_outliers):
    Hampel rule |x − med| > 3·1.4826·MAD — the metric-stream data-quality
    gate a training pipeline runs before trusting a day's telemetry.  Two
    group-sized aggregates broadcast back; no corpus-wide re-shuffle."""
    from ago_sisdb_spark.operators.series import mad_outliers

    ev = _t(spark, sf_dir, "events")
    return mad_outliers(ev, "event_type", "value", k=3.0)


@query(
    "w3_funnel",
    oracle="""
    WITH v AS (SELECT user_id, min(ts) AS tv FROM events
               WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e.user_id, min(e.ts) AS tc
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.tv GROUP BY 1),
    p AS (SELECT e.user_id, min(e.ts) AS tp
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.tc GROUP BY 1)
    SELECT 1 AS step_no, 'view' AS step, (SELECT count(*) FROM v) AS n_users
    UNION ALL
    SELECT 2, 'click', (SELECT count(*) FROM c)
    UNION ALL
    SELECT 3, 'purchase', (SELECT count(*) FROM p)
    """,
    extended=True,
)
def w3_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis view→click→purchase: each step counts users
    whose step event strictly FOLLOWS their previous step's first
    occurrence — sequential-pattern analytics the reference's key-
    addressed scans can't compose.  Three per-user min aggregations, each
    joined forward on user_id (group-key shuffles only; at 1000 executors
    each stage is a co-partitioned user-keyed agg)."""
    from ago_sisdb_spark.materialize import materialize

    ev = _t(spark, sf_dir, "events")
    # v and c are NARROW user-cardinality collapse points (user_id + one
    # timestamp) with TWO consumers each (the next step's join + the
    # step's own count) — without the pin, step 3's lineage re-runs the
    # view scan+agg a third time and the click chain a second (r12
    # dupscan fix, events:6 → 3; the n5 per-doc-lengths precedent)
    v = materialize(
        ev.where(F.col("event_type") == "view").groupBy("user_id").agg(
            F.min("ts").alias("tv")
        )
    )
    c = materialize(
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("tc"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    spark_df = spark.createDataFrame(
        [(1, "view"), (2, "click"), (3, "purchase")], "step_no int, step string"
    )
    counts = (
        v.agg(F.count(F.lit(1)).alias("n")).withColumn("step_no", F.lit(1))
        .unionByName(
            c.agg(F.count(F.lit(1)).alias("n")).withColumn("step_no", F.lit(2))
        )
        .unionByName(
            p.agg(F.count(F.lit(1)).alias("n")).withColumn("step_no", F.lit(3))
        )
    )
    return spark_df.join(counts, "step_no").select(
        "step_no", "step", F.col("n").alias("n_users")
    )


@query(
    "w4_retention",
    oracle="""
    WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS d0
               FROM events GROUP BY 1),
    a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
    SELECT f.d0 AS cohort_day,
           CAST(datediff('day', f.d0, a.d) AS BIGINT) AS day_offset,
           count(*) AS n_users
    FROM a JOIN f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
    extended=True,
)
def w4_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, counted on
    each later active day — the (cohort, day-offset) engagement triangle.
    One distinct-activity pass + one first-seen aggregate, joined on the
    user key; output is #cohorts × #days rows regardless of event
    volume."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").cast("date").alias("d")
    )
    f = ev.groupBy("user_id").agg(F.min("d").alias("d0"))
    a = ev.distinct()
    return (
        a.join(f, "user_id")
        .groupBy(F.col("d0").alias("cohort_day"),
                 F.datediff("d", "d0").cast("long").alias("day_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "w5_event_motifs",
    oracle="""
    WITH s AS (
        SELECT user_id, event_type,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    m AS (
        SELECT event_type || '>' || e2 || '>' || e3 AS motif
        FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL),
    c AS (SELECT motif, count(*) AS n FROM m GROUP BY motif)
    SELECT CAST(row_number() OVER (ORDER BY n DESC, motif) AS BIGINT) AS rank,
           motif, n
    FROM c QUALIFY rank <= 20
    """,
    extended=True,
)
def w5_event_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral motif mining: the 20 most frequent consecutive 3-event
    sequences per user stream (lead windows over the user key, counts at
    motif-vocabulary cardinality |event_types|^3 — bounded regardless of
    event volume).  The sequence-analytics sibling of w3's funnel."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    c = s.select(
        F.concat_ws(">", "event_type", "e2", "e3").alias("motif")
    ).groupBy("motif").agg(F.count(F.lit(1)).alias("n"))
    # TakeOrderedAndProject + window-free rank over the 20 survivors, not
    # a row_number window over the whole motif vocabulary (r6 verdict #2)
    return lastper.topk_global(c, "n", "motif", 20).select(
        "rank", "motif", "n"
    )


@query(
    "a20_cusum",
    oracle="""
    WITH stats AS (
        SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd,
               count(*) AS n
        FROM events GROUP BY 1),
    dev AS (
        SELECT e.event_type, e.event_id, s.n,
               sum((e.value - s.mu) / s.sd) OVER (
                   PARTITION BY e.event_type ORDER BY e.event_id) AS cusum
        FROM events e JOIN stats s USING (event_type)
        WHERE s.sd > 0)
    SELECT event_type, n, round(abs(cusum), 6) AS peak_cusum,
           event_id AS peak_at,
           abs(cusum) > 5.0 * sqrt(n) AS changed
    FROM dev
    QUALIFY row_number() OVER (PARTITION BY event_type
                               ORDER BY abs(cusum) DESC, event_id) = 1
    UNION ALL
    SELECT event_type, n, 0.0 AS peak_cusum, CAST(NULL AS BIGINT) AS peak_at,
           false AS changed
    FROM stats WHERE sd IS NULL OR sd <= 0
    """,
    extended=True,
)
def a20_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point screen per event type (operators/series.
    cusum_changepoint): peak running standardized deviation + location —
    catches sustained level shifts the pointwise MAD screen (a18) cannot.
    One stats aggregate broadcast back, one ordered window, one argmax."""
    from ago_sisdb_spark.operators.series import cusum_changepoint

    ev = _t(spark, sf_dir, "events")
    return cusum_changepoint(ev, "event_type", "event_id", "value")


@query(
    "a21_ab_ttest",
    oracle="""
    WITH g AS (
        SELECT event_type, user_id % 2 AS arm,
               avg(value) AS m, var_samp(value) AS s2, count(*) AS n
        FROM events GROUP BY 1, 2),
    w AS (
        SELECT a.event_type, a.m AS m_a, b.m AS m_b, a.n AS n_a, b.n AS n_b,
               a.s2 / a.n + b.s2 / b.n AS se2,
               a.s2 / a.n AS va, b.s2 / b.n AS vb
        FROM g a JOIN g b ON a.event_type = b.event_type
        WHERE a.arm = 0 AND b.arm = 1)
    SELECT event_type, n_a, n_b,
           round(m_a - m_b, 6) AS mean_diff,
           round((m_a - m_b) / sqrt(se2), 6) AS t_stat,
           round(pow(se2, 2) / (pow(va, 2) / (n_a - 1) + pow(vb, 2) / (n_b - 1)),
                 6) AS welch_df,
           abs((m_a - m_b) / sqrt(se2)) > 1.96 AS significant
    FROM w
    """,
    extended=True,
)
def a21_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample comparison per event type (A/B arms = user parity):
    mean difference, t statistic, Welch–Satterthwaite df, and the z≈1.96
    significance flag — the experiment-analysis primitive over the metric
    stream.  One grouped aggregate per arm self-joined on the series key;
    nothing row-scale after the aggregation."""
    ev = _t(spark, sf_dir, "events")
    g = ev.groupBy(
        "event_type", (F.col("user_id") % 2).alias("arm")
    ).agg(
        F.avg("value").alias("m"),
        F.var_samp("value").alias("s2"),
        F.count(F.lit(1)).alias("n"),
    )
    a = g.where(F.col("arm") == 0).select(
        "event_type", F.col("m").alias("m_a"),
        F.col("s2").alias("s2_a"), F.col("n").alias("n_a"),
    )
    b = g.where(F.col("arm") == 1).select(
        "event_type", F.col("m").alias("m_b"),
        F.col("s2").alias("s2_b"), F.col("n").alias("n_b"),
    )
    j = a.join(b, "event_type")
    va = F.col("s2_a") / F.col("n_a")
    vb = F.col("s2_b") / F.col("n_b")
    se2 = va + vb
    t = (F.col("m_a") - F.col("m_b")) / F.sqrt(se2)
    return j.select(
        "event_type", "n_a", "n_b",
        F.round(F.col("m_a") - F.col("m_b"), 6).alias("mean_diff"),
        F.round(t, 6).alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / (F.pow(va, 2) / (F.col("n_a") - 1) + F.pow(vb, 2) / (F.col("n_b") - 1)),
            6,
        ).alias("welch_df"),
        (F.abs(t) > 1.96).alias("significant"),
    )


@query(
    "s4_time_split",
    oracle="""
    WITH cut AS (
        SELECT quantile_cont(epoch_us(ts), 0.8) AS c FROM events),
    tagged AS (
        SELECT CASE WHEN epoch_us(e.ts) < cut.c THEN 'train' ELSE 'valid' END
                   AS split,
               epoch_us(e.ts) AS tus, e.event_id
        FROM events e, cut)
    SELECT split, count(*) AS n,
           CAST(min(tus) AS BIGINT) AS min_ts_us,
           CAST(max(tus) AS BIGINT) AS max_ts_us
    FROM tagged GROUP BY split
    """,
    extended=True,
)
def s4_time_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/valid split at the 80th time percentile — the
    leakage-safe alternative to s1's random stratified split for
    time-series models: everything the model trains on strictly precedes
    everything it is validated on (train.max_ts < valid.min_ts by
    construction, visible in the output columns).  One percentile
    aggregate broadcast into a codegen'd tag filter."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("tus")
    )
    cut = ev.agg(F.percentile("tus", F.lit(0.8)).alias("c"))
    tagged = ev.crossJoin(F.broadcast(cut)).select(
        F.when(F.col("tus") < F.col("c"), "train").otherwise("valid").alias("split"),
        "tus",
    )
    return tagged.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("tus").cast("long").alias("min_ts_us"),
        F.max("tus").cast("long").alias("max_ts_us"),
    )


@query(
    "a22_seasonal_residuals",
    oracle="""
    WITH prof AS (
        SELECT event_type, extract(hour FROM ts) AS hr,
               avg(value) AS hr_mean
        FROM events GROUP BY 1, 2),
    res AS (
        SELECT e.event_type, e.event_id,
               e.value - p.hr_mean AS resid
        FROM events e
        JOIN prof p ON e.event_type = p.event_type
                   AND extract(hour FROM e.ts) = p.hr)
    SELECT event_type,
           CAST(row_number() OVER (PARTITION BY event_type
                ORDER BY abs(resid) DESC, event_id) AS BIGINT) AS rank,
           event_id, round(resid, 6) AS resid
    FROM res QUALIFY rank <= 5
    """,
    extended=True,
)
def a22_seasonal_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomalies: hour-of-day mean profile per series
    (the simplest seasonal decomposition), then the top-5 absolute
    residuals — catches 'large for 3 a.m.' values that a global screen
    (a18) never flags.  Profile is series×24 rows, broadcast back; the
    ranking window is the only row-scale shuffle."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", "event_id", "value",
        F.hour(F.col("ts").cast("timestamp")).alias("hr"),
    )
    prof = ev.groupBy("event_type", "hr").agg(F.avg("value").alias("hr_mean"))
    res = ev.join(F.broadcast(prof), ["event_type", "hr"]).select(
        "event_type", "event_id", (F.col("value") - F.col("hr_mean")).alias("resid")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("resid")).desc(), "event_id"
    )
    return (
        res.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 5)
        .select("event_type", "rank", "event_id", F.round("resid", 6).alias("resid"))
    )


@query(
    "a23_mannwhitney",
    oracle="""
    WITH per AS (
        SELECT value AS v,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_b
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY value),
    cum AS (
        SELECT *, CAST(coalesce(sum(n_b) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS cum_n_b
        FROM per),
    agg AS (
        SELECT CAST(sum(n_a) AS BIGINT) AS n_a,
               CAST(sum(n_b) AS BIGINT) AS n_b,
               CAST(sum(n_a * (2 * cum_n_b + n_b)) AS BIGINT) AS u1_x2,
               CAST(sum((n_a + n_b) * (n_a + n_b) * (n_a + n_b)
                   - (n_a + n_b)) AS BIGINT) AS tie_term
        FROM cum)
    SELECT n_a, n_b, u1_x2, tie_term,
           (CAST(u1_x2 AS DOUBLE)
              - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
           / (CAST(2 AS DOUBLE) * sqrt(
               CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / CAST(12 AS DOUBLE)
               * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + CAST(1 AS DOUBLE))
                  - CAST(tie_term AS DOUBLE)
                    / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                       * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)
                          - CAST(1 AS DOUBLE)))))) AS z
    FROM agg
    """,
    extended=True,
)
def a23_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (operators/series.mannwhitney_u):
    tie-aware nonparametric A/B comparison of event values between the
    click and purchase streams.  Integer-exact pair counts over the
    distinct-value collapse (range-partitioned prefix sums — the helper
    scales to corpus-cardinality value domains); z is one fixed tree of
    correctly-rounded IEEE ops, bit-portable cross-engine."""
    from ago_sisdb_spark.operators import series as series_ops

    ev = _t(spark, sf_dir, "events")
    return series_ops.mannwhitney_u(ev, "value", "event_type", "click", "purchase")
