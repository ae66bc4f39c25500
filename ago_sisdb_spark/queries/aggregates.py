"""§2.4 — rollup pipeline + group-by surface.

A1/A2 OHLCV time-scale rollup is the reference's only real aggregation
pipeline (`bin/init-sisdb.conf:61-93,288-298`); the relational group-by
surface (cube/rollup/grouping sets/count-distinct) is declared for parity
(SURVEY §2.4 last row).  Floating-point aggregates are rounded identically
on both sides so summation order can't flip the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ago_sisdb_spark.inventory import _t, query
from ago_sisdb_spark.operators import rollup


# Engine-portable ANSI SQL: the DuckDB oracle for q1 AND the exact text the
# sql_surface parity entry replays through spark.sql over registered views
# (queries/sqlsurface.py) — one string, three engines' consumers.
Q1_SQL = """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           round(sum(l_extendedprice), 2)                               AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 6)                                    AS avg_qty,
           round(avg(l_extendedprice), 6)                               AS avg_price,
           round(avg(l_discount), 6)                                    AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """


@query("q1_pricing_summary", oracle=Q1_SQL)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-style pricing summary — the full scan+agg path the
    reference serves via per-key reads + client math; here one partial-agg
    shuffle of ~|groups| rows regardless of input size."""
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "a1_ohlcv_rollup",
    oracle="""
    SELECT event_type,
           date_trunc('hour', ts)            AS bar_start,
           round(arg_min(value, CAST(epoch_us(ts) AS HUGEINT) * 4294967296 + event_id), 2) AS open,
           round(max(value), 2)               AS high,
           round(min(value), 2)               AS low,
           round(arg_max(value, CAST(epoch_us(ts) AS HUGEINT) * 4294967296 + event_id), 2) AS close,
           count(*)                           AS volume,
           round(sum(value), 2)               AS money
    FROM events
    GROUP BY 1, 2
    """,
)
def a1_ohlcv_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: fine quotes → hourly OHLCV bars per key (init-sisdb.conf:61-93).

    `event_id` is the deterministic tie-break (reference relies on insertion
    order; SURVEY §7 hard part d).  All aggs combine map-side: shuffle
    carries one row per (key, bar)."""
    ev = _t(spark, sf_dir, "events")
    bars = rollup.ohlcv(
        ev,
        key_cols=["event_type"],
        time_col="ts",
        price_col="value",
        width="1 hour",
        order_col="event_id",
        volume_col="value",
    )
    return bars.select(
        "event_type",
        "bar_start",
        F.round("open", 2).alias("open"),
        F.round("high", 2).alias("high"),
        F.round("low", 2).alias("low"),
        F.round("close", 2).alias("close"),
        "volume",
        F.round("money", 2).alias("money"),
    )


@query(
    "a2_time_unit_conversion",
    oracle="""
    SELECT date_trunc('day', ts) AS day, count(*) AS n,
           round(sum(value), 2) AS total
    FROM events GROUP BY 1
    """,
)
def a2_time_unit_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: time-scale conversion during rollup (sis_db.c:355-360) = date_trunc."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )


@query(
    "a17_resample_ffill",
    oracle="""
    WITH bars AS (
        SELECT event_type, date_trunc('hour', ts) AS bar_start,
               arg_max(value, CAST(epoch_us(ts) AS HUGEINT) * 4294967296
                       + event_id) AS close,
               count(*) AS volume
        FROM events WHERE value >= 80 GROUP BY 1, 2),
    bounds AS (
        SELECT event_type, min(bar_start) AS t0, max(bar_start) AS t1
        FROM bars GROUP BY 1),
    grid AS (
        SELECT event_type,
               unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS bar_start
        FROM bounds),
    j AS (
        SELECT g.event_type, g.bar_start, b.close, b.volume
        FROM grid g LEFT JOIN bars b
          ON g.event_type = b.event_type AND g.bar_start = b.bar_start)
    SELECT event_type, bar_start,
           (volume IS NULL) AS is_gap,
           round(last_value(close IGNORE NULLS) OVER (
                 PARTITION BY event_type ORDER BY bar_start
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS close,
           CAST(volume AS BIGINT) AS volume
    FROM j
    """,
    extended=True,
)
def a17_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-free bar grid with forward fill (operators/resample): sparse
    hourly bars (value ≥ 80 keeps ~1/5 of events, so real holes appear)
    aligned to each key's complete hourly grid, close carried into gaps,
    volume left NULL on generated slots — the reference's `ifprev`
    carry-forward (sisdb_fmap.h:102-117) generalized to bar series."""
    from ago_sisdb_spark.operators import resample

    ev = _t(spark, sf_dir, "events").where(F.col("value") >= 80)
    bars = rollup.ohlcv(
        ev, ["event_type"], "ts", "value", "1 hour",
        order_col="event_id",
    )
    res = resample.resample_ffill(
        bars.select("event_type", "bar_start", "close", "volume"),
        ["event_type"], "bar_start", "1 hour",
        fill_cols=["close"], carry_cols=["volume"],
    )
    return res.select(
        "event_type",
        "bar_start",
        "is_gap",
        F.round("close", 2).alias("close"),
        F.col("volume").cast("bigint").alias("volume"),
    )


@query(
    "a15_value_buckets",
    oracle="""
    SELECT least(greatest(CAST(floor(value / 10.0) AS INTEGER), 0), 9) AS bucket,
           count(*) AS n, round(avg(value), 6) AS avg_value
    FROM events GROUP BY 1
    """,
    extended=True,
)
def a15_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15: value-bucket grouping (s_sis_groups, sis_group.h:10-60) —
    equal-width buckets as pure arithmetic (stays in codegen, no UDF)."""
    ev = _t(spark, sf_dir, "events")
    bucket = F.least(
        F.greatest(F.floor(F.col("value") / 10.0).cast("int"), F.lit(0)), F.lit(9)
    )
    return ev.groupBy(bucket.cast("bigint").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 6).alias("avg_value")
    )


@query(
    "a16_dedup_exact",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def a16_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16: unique-field dedup (sis_dynamic.h:106,126) = dropDuplicates."""
    return _t(spark, sf_dir, "events").select("user_id", "event_type").dropDuplicates()


@query(
    "agg_rollup_hierarchy",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    extended=True,
)
def agg_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parity: ROLLUP grouping (absent in reference, SURVEY §2.4)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "agg_cube",
    oracle="""
    SELECT event_type, CAST(ts AS DATE) AS day,
           count(*) AS n, round(sum(value), 2) AS total
    FROM events GROUP BY CUBE (event_type, CAST(ts AS DATE))
    """,
    extended=True,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parity: CUBE grouping."""
    ev = _t(spark, sf_dir, "events").withColumn("day", F.col("ts").cast("date"))
    return ev.cube("event_type", "day").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n
    FROM events GROUP BY event_type
    """,
    extended=True,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count per group (declared parity row)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query("agg_approx_count_distinct", oracle=None, extended=True)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL) — approximate by design, rows-only check;
    the scale path for distinct counts at 100 TB."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.01).alias("approx_users"))
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT event_type, user_id, count(*) AS n
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_id))
    """,
    extended=True,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parity: GROUPING SETS via SQL (same Catalyst Expand as cube/rollup)."""
    ev = _t(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__gs_events")
    return spark.sql(
        """
        SELECT event_type, user_id, count(*) AS n
        FROM __gs_events
        GROUP BY GROUPING SETS ((event_type), (user_id))
        """
    )


@query(
    "w2_session_window",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events WHERE user_id < 50),
    ids AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked)
    SELECT user_id, min(ts) AS session_start,
           count(*) AS n_events, round(sum(value), 4) AS session_value
    FROM ids GROUP BY user_id, session_id
    """,
    extended=True,
)
def w2_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via F.session_window (30-minute inactivity gap) — the
    Spark-native form of gaps-and-islands; state-store-backed under
    streaming, plain agg in batch.  Oracle computes the same sessions with
    lag + running-sum island ids."""
    ev = _t(spark, sf_dir, "events").where(F.col("user_id") < 50)
    out = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("sw")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("session_value"),
        F.min("ts").alias("session_start"),
    )
    return out.select("user_id", "session_start", "n_events", "session_value")


@query(
    "agg_pivot",
    oracle="""
    SELECT user_id,
           CAST(count(*) FILTER (event_type = 'click')    AS BIGINT) AS click,
           CAST(count(*) FILTER (event_type = 'view')     AS BIGINT) AS view,
           CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(count(*) FILTER (event_type = 'error')    AS BIGINT) AS error
    FROM events WHERE user_id < 40 GROUP BY user_id
    """,
    extended=True,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide reshaping: df.groupBy().pivot() with an explicit value list —
    explicit values keep it ONE pass (auto-discovery adds a distinct scan
    and is unbounded-width at scale)."""
    ev = _t(spark, sf_dir, "events").where(F.col("user_id") < 40)
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "error"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c)
          for c in ("click", "view", "purchase", "error")],
    )


@query(
    "agg_unpivot",
    oracle="""
    SELECT o_orderkey, 'price' AS metric, o_totalprice AS value
    FROM orders WHERE o_orderkey < 300
    UNION ALL
    SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE)
    FROM orders WHERE o_orderkey < 300
    """,
    extended=True,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long reshaping (melt): unpivot two measures into (metric, value)
    rows — stack() expands row-wise in the scan projection, no shuffle."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 300)
    return o.unpivot(
        "o_orderkey",
        [F.col("o_totalprice").alias("price"),
         F.col("o_custkey").cast("double").alias("custkey")],
        "metric",
        "value",
    )


@query(
    "a15_golden_buckets",
    oracle="""
    SELECT CAST(CASE WHEN value < 3.647451 THEN 0 WHEN value < 9.54915 THEN 1 WHEN value < 19.098301 THEN 2 WHEN value < 34.54915 THEN 3 WHEN value < 59.54915 THEN 4 ELSE 5 END AS BIGINT) AS bucket,
           count(*) AS n, round(avg(value), 6) AS avg_value
    FROM events GROUP BY 1
    """,
    extended=True,
)
def a15_golden_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15 golden-ratio widths (sis_group.h:10-60 second mode): bucket
    boundaries grow by phi so fine resolution sits at the low end — the
    reference's 黄金分割 grouping; boundaries precomputed once, the bucket
    expression stays in codegen."""
    ev = _t(spark, sf_dir, "events")
    bucket = F.when(F.col("value") < 3.647451, 0).when(F.col("value") < 9.54915, 1).when(F.col("value") < 19.098301, 2).when(F.col("value") < 34.54915, 3).when(F.col("value") < 59.54915, 4).otherwise(5)
    return ev.groupBy(bucket.cast("bigint").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 6).alias("avg_value")
    )
