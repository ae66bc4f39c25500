"""§2.1/§2.2/§2.6/§2.7 — scans, projections, predicates, sort/limit, set ops.

Reference semantics: key-addressed time-range reads with projection and the
(start, stop, offset, count, ifprev) matrix (`workers/sisdb/sisdb_fmap.h:102-137`,
`sisdb_io.c:23-77`).  The `events` table plays the role of an intraday series
(ts = main index); `event_id` is the deterministic tie-break order key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ago_sisdb_spark.inventory import _t, query
from ago_sisdb_spark.operators import lastper, rangescan

EV_COLS = ["event_id", "ts", "user_id", "event_type", "value"]


@query(
    "s1_last_record",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events ORDER BY ts DESC, event_id DESC LIMIT 1
    """,
    extended=True,
)
def s1_last_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`get key.sdb` with no args → latest record (sisdb.c:217-258)."""
    ev = _t(spark, sf_dir, "events").select(*EV_COLS)
    return rangescan.last_record(ev, [F.col("ts"), F.col("event_id")])


@query(
    "s2_time_range_scan",
    oracle="""
    SELECT event_id, ts, event_type, value FROM events
    WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00' AND TIMESTAMP '2024-01-12 23:59:59'
    """,
)
def s2_time_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[start, stop] slice (S2: sisdb_io.c:23-77) — filter pushed to parquet."""
    ev = _t(spark, sf_dir, "events")
    return rangescan.time_range(
        ev, "ts", "2024-01-10 00:00:00", "2024-01-12 23:59:59"
    ).select("event_id", "ts", "event_type", "value")


@query(
    "p1_projection",
    oracle="SELECT ts, event_type, value, user_id FROM events",
)
def p1_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fields:"a,b,c" projection with output column order (P1: sisdb_io.c:79-93)."""
    return _t(spark, sf_dir, "events").select("ts", "event_type", "value", "user_id")


@query(
    "p2_exact_time_where",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
    WHERE o_orderdate = TIMESTAMP '1996-06-01 00:00:00'
    """,
    extended=True,
)
def p2_exact_time_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict main-index match (P2: sisdb_fmap_ctrl.c:575-593) at day scale."""
    return (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") == F.lit("1996-06-01 00:00:00").cast("timestamp"))
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
            "o_totalprice",
        )
    )


@query(
    "p3_head_count",
    oracle="""
    SELECT event_id, ts, value FROM events
    WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
    ORDER BY ts, event_id LIMIT 100
    """,
    extended=True,
)
def p3_head_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """start + count>0 → first n from start (P3/O2: sisdb_fmap.h:155-160)."""
    ev = rangescan.time_range(
        _t(spark, sf_dir, "events"), "ts", start="2024-01-15 00:00:00"
    )
    return rangescan.head_n(
        ev.select("event_id", "ts", "value"), 100, [F.col("ts"), F.col("event_id")]
    )


@query(
    "p3_tail_lastn",
    oracle="""
    SELECT event_id, ts, value FROM events
    ORDER BY ts DESC, event_id DESC LIMIT 50
    """,
    extended=True,
)
def p3_tail_lastn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count<0 / start=-1 → last n (O3: sisdb_fmap.h:104,127)."""
    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "value")
    return rangescan.tail_n(ev, 50, [F.col("ts"), F.col("event_id")])


@query(
    "p3_ifprev_day",
    oracle="""
    SELECT event_id, ts, event_type, value FROM events
    WHERE CAST(ts AS DATE) = (
        SELECT max(CAST(ts AS DATE)) FROM events
        WHERE ts <= TIMESTAMP '2024-02-15 00:00:00')
    """,
    extended=True,
)
def p3_ifprev_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ifprev → fall back to most recent day with data (sisdb_fmap.h:112-117).

    2024-02-15 is past the end of the series, so this returns the last
    populated day — the previous-trading-day semantics.
    """
    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "event_type", "value")
    return rangescan.ifprev_day_scan(ev, "ts", "2024-02-15 00:00:00")


@query(
    "p4_field_predicates",
    oracle="""
    SELECT event_id, event_type, value, user_id FROM events
    WHERE lower(event_type) IN ('click', 'view')
      AND value BETWEEN 10.0 AND 50.0
      AND user_id = 42
    """,
    extended=True,
)
def p4_field_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """same/group/in predicates AND-composed (P4: sisdb_fmap.h:92-100),
    case-insensitive string compare per the reference rule."""
    ev = _t(spark, sf_dir, "events")
    return ev.where(
        F.lower(F.col("event_type")).isin("click", "view")
        & F.col("value").between(10.0, 50.0)
        & (F.col("user_id") == 42)
    ).select("event_id", "event_type", "value", "user_id")


@query(
    "p4_or_composition",
    oracle="""
    SELECT event_id, event_type, value FROM events
    WHERE (event_type = 'error' AND value > 90.0)
       OR (event_type = 'purchase' AND value < 2.0)
    """,
    extended=True,
)
def p4_or_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-array search form (P4: sisdb.h:50-53)."""
    ev = _t(spark, sf_dir, "events")
    return ev.where(
        ((F.col("event_type") == "error") & (F.col("value") > 90.0))
        | ((F.col("event_type") == "purchase") & (F.col("value") < 2.0))
    ).select("event_id", "event_type", "value")


@query(
    "p5_key_pattern",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type FROM part
    WHERE p_brand LIKE 'Brand#1%' AND p_type LIKE '%OMO%'
    """,
)
def p5_key_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key fan-out: prefix ("head match") + substring glob (P5:
    api_sisdb.h:66-78, sis_utils.h:60-73) as like/startswith pushdown."""
    p = _t(spark, sf_dir, "part")
    return p.where(
        F.col("p_brand").startswith("Brand#1") & F.col("p_type").contains("OMO")
    ).select("p_partkey", "p_name", "p_brand", "p_type")


@query(
    "p6_last_per_key",
    oracle="""
    SELECT user_id, ts, event_type, value FROM (
        SELECT user_id, ts, event_type, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1
    """,
)
def p6_last_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`gets`: latest record per key (P6: sisdb.c:359-395) via max_by —
    map-side combine keeps the shuffle at one row per key."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_type", "value", "event_id")
    out = lastper.last_per_key(ev, ["user_id"], "event_id")
    return out.select("user_id", "ts", "event_type", "value")


@query(
    "o5_topk_per_group",
    oracle="""
    SELECT event_type, event_id, value FROM (
        SELECT event_type, event_id, value,
               row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
        FROM events) WHERE rn <= 3
    """,
    extended=True,
)
def o5_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by score per bucket (O5: sis_group.h:15-47)."""
    ev = _t(spark, sf_dir, "events")
    out = lastper.topk_per_key(
        ev.select("event_type", "event_id", "value"),
        ["event_type"],
        [F.col("value").desc(), F.col("event_id").asc()],
        3,
    )
    return out


@query(
    "set_union",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    UNION
    SELECT user_id FROM events WHERE event_type = 'signup'
    """,
    extended=True,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 union (key-set algebra analogue, sis_utils.h:60-82)."""
    ev = _t(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "click").select("user_id")
    b = ev.where(F.col("event_type") == "signup").select("user_id")
    return a.union(b).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
    extended=True,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 INTERSECT: users who both purchased and errored (set semantics,
    dedup built in — implemented as an aggregate-marked join by Catalyst)."""
    ev = _t(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "purchase").select("user_id")
    b = ev.where(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


@query(
    "set_except",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view' AND value > 100
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 100
    """,
    extended=True,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 EXCEPT: high-value viewers who never purchased at that level
    (anti-semantics with set dedup)."""
    ev = _t(spark, sf_dir, "events")
    a = ev.where((F.col("event_type") == "view") & (F.col("value") > 100)).select("user_id")
    b = ev.where((F.col("event_type") == "purchase") & (F.col("value") > 100)).select("user_id")
    return a.subtract(b)


@query(
    "p3_offset_shift",
    oracle="""
    WITH ranked AS (
        SELECT event_id, ts, value,
               row_number() OVER (ORDER BY ts, event_id) AS rn
        FROM events WHERE user_id = 7),
    anchor AS (
        SELECT max(rn) AS arn FROM ranked
        WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
    SELECT r.event_id, r.ts, r.value
    FROM ranked r, anchor a WHERE r.rn = a.arn - 2
    """,
    extended=True,
)
def p3_offset_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 `offset: -n` record addressing (sisdb_fmap.h:156-158): locate the
    record at/just before a time, then step n records back in series order
    (operators/rangescan.offset_shift — row_number + broadcast anchor,
    no driver round-trip)."""
    ev = _t(spark, sf_dir, "events").where(F.col("user_id") == 7)
    out = rangescan.offset_shift(
        ev,
        "ts",
        "2024-01-15 00:00:00",
        -2,
        [F.col("ts"), F.col("event_id")],
    )
    return out.select("event_id", "ts", "value")


@query(
    "r1_kway_merge",
    oracle="""
    SELECT CAST(user_id AS VARCHAR) AS key, ts AS event_time,
           'events' AS source
    FROM events
    WHERE ts BETWEEN TIMESTAMP '2024-01-05 00:00:00'
                 AND TIMESTAMP '2024-01-20 23:59:59'
    UNION ALL
    SELECT CAST(o_custkey AS VARCHAR), CAST(o_orderdate AS TIMESTAMP),
           'orders'
    FROM orders
    WHERE CAST(o_orderdate AS TIMESTAMP)
          BETWEEN TIMESTAMP '2024-01-05 00:00:00'
              AND TIMESTAMP '2024-01-20 23:59:59'
    """,
    extended=True,
)
def r1_kway_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2/T3 batch replay: heterogeneous tables time-pruned *before* the
    union (partition pruning per source), merged to one event-time-ordered
    stream (`sis_db.c:420-533`).  Hash check is order-insensitive, so the
    oracle is the UNION ALL row set; ordering semantics are pinned by
    tests/test_replay.py."""
    from datetime import datetime

    from ago_sisdb_spark.streaming.replay import replay_range

    ev = _t(spark, sf_dir, "events")
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("timestamp").alias("o_ts"),
        "o_totalprice",
    )
    merged = replay_range(
        spark,
        [("events", ev, "user_id", "ts"), ("orders", orders, "o_custkey", "o_ts")],
        start=datetime(2024, 1, 5),
        stop=datetime(2024, 1, 20, 23, 59, 59),
    )
    return merged.select("key", "event_time", "source")


@query(
    "sub_match_set_algebra",
    oracle="""
    WITH uni AS (SELECT DISTINCT s_name AS key FROM supplier),
    a AS (SELECT key FROM uni WHERE key LIKE 'Supplier#0000000%'),
    b AS (SELECT key FROM uni WHERE key LIKE '%1%'),
    c AS (SELECT key FROM uni
          WHERE key IN ('Supplier#000000001','Supplier#000000002',
                        'Supplier#000000010'))
    SELECT 'union' AS op, key FROM (SELECT key FROM a UNION SELECT key FROM b)
    UNION ALL
    SELECT 'intersect' AS op, key
    FROM (SELECT key FROM a INTERSECT SELECT key FROM b)
    UNION ALL
    SELECT 'except' AS op, key
    FROM (SELECT key FROM a EXCEPT SELECT key FROM c)
    """,
    extended=True,
)
def sub_match_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-glob subscription algebra (`sis_utils.h:60-82`): match sets of
    three reference pattern forms (prefix glob, contains glob, comma list)
    over the supplier key universe, composed with the engine set ops the
    search service uses to merge/diff client subscriptions.  Each branch's
    pattern predicate is pushed into its scan; the distinct sets are
    key-cardinality-bounded."""
    from ago_sisdb_spark.materialize import materialize
    from ago_sisdb_spark.streaming.pubsub import key_pattern_filter

    # ONE distinct pass over the key universe (key-cardinality-bounded
    # collapse table, materialized) — the three pattern sets and the six
    # set-op consumers all filter it, instead of six table scans
    uni = materialize(
        _t(spark, sf_dir, "supplier")
        .select(F.col("s_name").cast("string").alias("key"))
        .distinct()
    )

    def mset(pattern: str):
        return uni.where(key_pattern_filter(F.col("key"), pattern))

    a = mset("Supplier#0000000*")
    b = mset("*1*")
    c = mset("Supplier#000000001,Supplier#000000002,Supplier#000000010")
    return (
        a.union(b).distinct().select(F.lit("union").alias("op"), "key")
        .unionByName(
            a.intersect(b).select(F.lit("intersect").alias("op"), "key")
        )
        .unionByName(
            a.exceptAll(c).distinct()
            .select(F.lit("except").alias("op"), "key")
        )
    )
