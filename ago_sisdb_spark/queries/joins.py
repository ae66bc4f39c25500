"""§2.3 — joins J1-J5.

The reference has no join engine (SURVEY §2.3); capability parity declares
the full Spark join surface.  Join-strategy notes per query record the plan
we want at 100 TB (verified via .explain in tests/bench):

- dims (region/nation/customer at typical scale) → broadcast hash join
- fact⋈fact (orders⋈lineitem) → sort-merge on the shuffled key, AQE may
  switch to shuffled-hash; both scale linearly
- as-of → single shuffle window form (operators/asof.py)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ago_sisdb_spark.inventory import _t, query
from ago_sisdb_spark.operators.asof import asof_join


@query(
    "j1_equi_inner",
    oracle="""
    SELECT n.n_name AS nation, count(*) AS n_customers,
           round(sum(c.c_acctbal), 2) AS total_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    extended=True,
)
def j1_equi_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 inner equi join; nation is a dim → Catalyst broadcasts it."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@query(
    "j1_left_outer",
    oracle="""
    SELECT c.c_custkey, count(o.o_orderkey) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spent
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
    extended=True,
)
def j1_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 left outer: customers with zero orders kept (count=0, total=0)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spent"
            ),
        )
    )


@query(
    "j1_full_outer",
    oracle="""
    SELECT coalesce(a.user_id, b.user_id) AS user_id,
           coalesce(a.n_click, 0) AS n_click, coalesce(b.n_purchase, 0) AS n_purchase
    FROM (SELECT user_id, count(*) AS n_click FROM events
          WHERE event_type = 'click' GROUP BY 1) a
    FULL OUTER JOIN
         (SELECT user_id, count(*) AS n_purchase FROM events
          WHERE event_type = 'purchase' GROUP BY 1) b
    ON a.user_id = b.user_id
    """,
    extended=True,
)
def j1_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 full outer join of two aggregated sides."""
    ev = _t(spark, sf_dir, "events")
    a = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_click"))
    )
    b = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purchase"))
    )
    j = a.join(b, "user_id", "full_outer")
    return j.select(
        "user_id",
        F.coalesce("n_click", F.lit(0)).alias("n_click"),
        F.coalesce("n_purchase", F.lit(0)).alias("n_purchase"),
    )


@query(
    "j2_broadcast_dim",
    oracle="""
    SELECT r.r_name AS region, count(*) AS n_nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    extended=True,
)
def j2_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: explicit broadcast hint for the small dim (memdb lookup-table
    analogue, memdb.h:16-28) — no shuffle of the probe side."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(F.count(F.lit(1)).alias("n_nations"))
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headline 3-way join (TPC-H Q3 shape): dim-filtered customer broadcast
    into orders, then fact⋈fact sort-merge on orderkey."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            # decimal arithmetic: the sum is exact, so it is independent of
            # partitioning/summation order — no float round-boundary flips
            # between engines (or between cluster runs).
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        )
    )


@query(
    "j4_range_join",
    oracle="""
    SELECT p.event_id AS purchase_id, count(c.event_id) AS clicks_before
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
    GROUP BY p.event_id
    """,
)
def j4_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 interval join ($scope compound predicate, sisdb_fmap.h:99-100):
    equi on user_id carries the shuffle; the time band is a post-filter, so
    this is NOT a cartesian — it scales with rows-per-user."""
    ev = _t(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    j = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") < F.col("p_ts")),
        "left",
    )
    return j.groupBy("purchase_id").agg(F.count("click_id").alias("clicks_before"))


@query(
    "j5_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    """,
    extended=True,
)
def j5_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 left semi (EXISTS) — key-list membership (sis_utils.h:60-73)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "j5_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
    """,
    extended=True,
)
def j5_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 left anti (NOT EXISTS): customers with no half-million order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 450000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "j3_asof_join",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, p.value,
           v.value AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
)
def j3_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 as-of join (k-way time-merge analogue, sis_db.c:420-485): each
    purchase gets the latest prior-or-equal view's value per user.  Window
    form: one shuffle on user_id, no per-row lookups (operators/asof.py)."""
    ev = _t(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    v = ev.where(F.col("event_type") == "view").select("user_id", "ts", "value")
    out = asof_join(
        p, v, key_cols=["user_id"], time_col="ts", value_cols=["value"]
    )
    return out.select("event_id", "user_id", "ts", "value", "asof_value")


@query(
    "j3b_asof_directions",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts, value FROM events
               WHERE event_type = 'purchase'),
    v AS (SELECT event_id AS vid, user_id, ts, value FROM events
          WHERE event_type = 'view'),
    b AS (SELECT p.*,
        (SELECT value FROM v WHERE v.user_id = p.user_id AND v.ts <= p.ts
         ORDER BY v.ts DESC, v.vid DESC LIMIT 1) AS bv,
        (SELECT ts FROM v WHERE v.user_id = p.user_id AND v.ts <= p.ts
         ORDER BY v.ts DESC, v.vid DESC LIMIT 1) AS bt,
        (SELECT value FROM v WHERE v.user_id = p.user_id AND v.ts >= p.ts
         ORDER BY v.ts ASC, v.vid ASC LIMIT 1) AS fv,
        (SELECT ts FROM v WHERE v.user_id = p.user_id AND v.ts >= p.ts
         ORDER BY v.ts ASC, v.vid ASC LIMIT 1) AS ft
      FROM p)
    SELECT 'backward' AS direction, event_id, user_id, ts, value,
           bv AS asof_value
    FROM b
    UNION ALL
    SELECT 'forward', event_id, user_id, ts, value, fv FROM b
    UNION ALL
    SELECT 'nearest', event_id, user_id, ts, value,
           CASE WHEN ft IS NULL THEN bv
                WHEN bt IS NULL THEN fv
                WHEN (ts - bt) <= (ft - ts) THEN bv ELSE fv END
    FROM b
    """,
    extended=True,
)
def j3b_asof_directions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full as-of direction family (operators/asof.asof_join r10:
    backward / forward / nearest with the right-tie pin), one tagged
    matrix over the j3 purchase/view pairing.  Forward is the same
    union+window scanned in descending time (no extra shuffle); nearest
    evaluates both fills on ONE union frame and chooses per row
    (interval comparison, tie -> backward, the pandas convention).  The
    oracle states each direction as a correlated argmin/argmax subquery
    with the same vid tie pin — oracle-scale only; the engine side is
    the one-shuffle window form."""
    from ago_sisdb_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    v = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", "value", F.col("event_id").alias("vid")
    )
    parts = []
    for d in ("backward", "forward", "nearest"):
        out = asof_join(
            p, v, key_cols=["user_id"], time_col="ts", value_cols=["value"],
            direction=d, right_order_col="vid",
        )
        parts.append(out.select(
            F.lit(d).alias("direction"),
            "event_id", "user_id", "ts", "value", "asof_value",
        ))
    return parts[0].unionByName(parts[1]).unionByName(parts[2])


@query(
    "j4b_keyless_interval",
    oracle="""
    WITH p AS (SELECT event_id, epoch_us(ts) AS pus FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT event_id AS cid, epoch_us(ts) AS cus FROM events
          WHERE event_type = 'click')
    SELECT p.event_id AS purchase_id,
           CAST(count(c.cid) AS BIGINT) AS n_clicks_near
    FROM p LEFT JOIN c
      ON c.cus BETWEEN p.pus - 600000000 AND p.pus + 600000000
    GROUP BY p.event_id
    """,
    extended=True,
)
def j4b_keyless_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYLESS interval join (operators/intervaljoin.bin_join_points):
    clicks within ±10 minutes of each purchase across ALL users — a range
    predicate with no equi key, which native Spark can only plan as
    BroadcastNestedLoopJoin/cartesian.  The binned form replicates each
    purchase window across its ≤3 ten-minute bins and equi-joins clicks
    on the bin id (points need no dedup), then a bounded left join
    restores zero-match purchases.  The oracle states the naive
    BETWEEN join directly."""
    from ago_sisdb_spark.operators.intervaljoin import bin_join_points

    w = 600_000_000  # 10 minutes in microseconds
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        (us - w).alias("lo"),
        (us + w).alias("hi"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), us.alias("cus")
    )
    counts = (
        bin_join_points(p, c, "lo", "hi", "cus", bin_width=w)
        .groupBy("purchase_id")
        .agg(F.count("click_id").alias("n_clicks_near"))
    )
    return p.select("purchase_id").join(counts, "purchase_id", "left").select(
        "purchase_id",
        F.coalesce("n_clicks_near", F.lit(0)).cast("long").alias("n_clicks_near"),
    )


@query(
    "j4c_interval_overlaps",
    oracle="""
    WITH p AS (SELECT event_id, epoch_us(ts) AS us FROM events
               WHERE event_type = 'purchase')
    SELECT a.event_id AS id_a, b.event_id AS id_b,
           CAST(abs(a.us - b.us) AS BIGINT) AS gap_us
    FROM p a JOIN p b
      ON a.event_id < b.event_id
     AND a.us - 300000000 <= b.us + 300000000
     AND b.us - 300000000 <= a.us + 300000000
    """,
    extended=True,
)
def j4c_interval_overlaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless interval×interval overlap (operators/intervaljoin.
    bin_join_intervals): purchases whose ±5-minute windows overlap across
    all users, each unordered pair exactly once (the first-shared-bin
    rule — a filter, never a distinct).  Naive Spark would nested-loop
    the whole purchase set against itself; binned it is an equi
    self-join on the ten-minute bin id.  Oracle = the naive overlap
    self-join with the same id ordering."""
    from ago_sisdb_spark.operators.intervaljoin import bin_join_intervals

    half = 300_000_000  # 5 minutes
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("id"), us.alias("us")
    )
    a = p.select(
        F.col("id").alias("id_a"), F.col("us").alias("us_a"),
        (F.col("us") - half).alias("lo_a"), (F.col("us") + half).alias("hi_a"),
    )
    b = p.select(
        F.col("id").alias("id_b"), F.col("us").alias("us_b"),
        (F.col("us") - half).alias("lo_b"), (F.col("us") + half).alias("hi_b"),
    )
    return (
        bin_join_intervals(
            a, b, "lo_a", "hi_a", "lo_b", "hi_b", bin_width=2 * half
        )
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.abs(F.col("us_a") - F.col("us_b")).cast("long").alias("gap_us"),
        )
    )
