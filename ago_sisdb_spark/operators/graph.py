"""Bounded-graph ranking for web-corpus curation: host-level PageRank.

Pretraining pipelines weight or gate documents by the authority of their
origin host (the Common-Crawl-derived corpora all do a host-level quality
pass; link-ish authority is the standard signal the URL blocklist lacks).
The HOST graph is vocabulary-scale — millions of nodes at 100 TB, never
corpus-scale — so the right Spark shape is: ONE corpus pass aggregates the
edge list, then a fixed number of iterations over node-sized tables
(join + integer aggregate per round), each round's result checkpointed
like connected_components' label frames.

Everything is EXACT int64 fixed-point (rank mass in e12 millionths-of-
millionths): per-edge contributions use integer div, per-node sums are
integer sums (order-independent — the float-PageRank summation-order trap
cannot occur), and the damping update is ``(15*base + 85*sum) div 100``.
Two engines running the same rounds produce bit-identical tables, which
is what makes the DuckDB oracle twin possible (pagerank_oracle_sql unrolls
the same rounds as CTEs).

Reference parity: none — the reference has no graph surface; this is
§2.11 beyond-reference pipeline surface (cf. connected_components in
operators/dedup.py for the other bounded-graph op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ago_sisdb_spark.materialize import materialize

RANK_SCALE = 1_000_000_000_000  # e12 fixed-point mass


def pagerank_e12(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    weight_col: str | None = None,
    iters: int = 5,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration weighted PageRank in exact e12 fixed-point.

    rank_0(v)   = RANK_SCALE div N
    contrib(e)  = (rank_i(src) * w(e)) div out_w(src)      (integer div)
    rank_{i+1}(v) = ((100-d)*base + d*sum contrib) div 100

    Dangling mass (nodes without out-edges) is dropped rather than
    redistributed — the standard simplification when ranks are used as a
    relative quality ORDER, not a probability distribution; document it,
    don't hide it.  Total mass therefore shrinks slightly per round and
    the floor-div loses ≤1 unit per edge — at e12 scale that is 12
    decimal digits of headroom over any real host graph.

    Scale shape: ``edges`` is the aggregated node-graph (vocabulary
    scale).  Each round is one broadcast-eligible join of the rank table
    onto the edge list plus one integer aggregate; the node-sized rank
    frame is materialized per round (the connected_components convention)
    so round k+1 never replays rounds 1..k.

    Returns (node, rank_e12) over every node appearing as src or dst.

    Overflow (r13, the hits_e6 ADVICE class): a rank can approach the
    full RANK_SCALE = 1e12 mass, so the per-edge product rank·w would
    overflow int64 at aggregated edge weight ~9.2e6 — exactly
    popular-host scale.  The contribution product is therefore computed
    in DECIMAL(38,0) (HUGEINT in the DuckDB twin); the quotient is
    ≤ rank ≤ RANK_SCALE and always fits a long.  The remaining int64
    bound is the per-node weighted out-degree SUM (< 2^63 — vacuous for
    real graphs).

    Weights must be NON-NEGATIVE (same contract as hits_e6): Spark
    ``div`` truncates toward zero while DuckDB ``//`` floors, so
    negative contributions diverge across engines; validated at build
    time on the grouped weight table.
    """
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0, 100), got {damping_pct}")
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    e = edges.select(
        F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst"),
        w.alias("__w"),
    )
    e = materialize(
        e.groupBy("__src", "__dst").agg(F.sum("__w").alias("__w"))
    )
    min_w = e.agg(F.min("__w").alias("__mw")).collect()[0]["__mw"]
    if min_w is not None and min_w < 0:
        raise ValueError(
            "pagerank_e12 requires non-negative aggregate edge weights "
            f"(min grouped weight = {min_w}): trunc-div (Spark) vs "
            "floor-div (DuckDB/Python) diverge on negative contributions"
        )
    nodes = materialize(
        e.select(F.col("__src").alias("node"))
        .unionByName(e.select(F.col("__dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("__src").agg(F.sum("__w").alias("__ow"))
    n_total = nodes.agg(F.count(F.lit(1)).alias("__n"))
    base = nodes.crossJoin(F.broadcast(n_total)).select(
        "node",
        F.expr(f"{RANK_SCALE} div __n").cast("long").alias("__base"),
    )
    base = materialize(base)
    rank = base.select("node", F.col("__base").alias("rank_e12"))
    keep = 100 - damping_pct
    for _ in range(iters):
        contrib = (
            e.join(rank, e["__src"] == rank["node"])
            .join(outdeg, "__src")
            .select(
                F.col("__dst").alias("node"),
                F.expr(
                    "(cast(rank_e12 as decimal(38,0)) * __w) div __ow"
                ).cast("long").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__s"))
        )
        rank = materialize(
            base.join(contrib, "node", "left").select(
                "node",
                F.expr(
                    f"({keep} * __base + {damping_pct} * coalesce(__s, 0))"
                    f" div 100"
                )
                .cast("long")
                .alias("rank_e12"),
            )
        )
    return rank


HITS_SCALE = 1_000_000  # e6 fixed-point for hub/authority scores


def hits_e6(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    weight_col: str | None = None,
    iters: int = 3,
) -> DataFrame:
    """Fixed-iteration HITS hubs & authorities (Kleinberg 1999, "Authoritative
    Sources in a Hyperlinked Environment") in exact e6 fixed-point — the
    link-analysis companion to ``pagerank_e12`` for host-level corpus
    curation: PageRank scores endorsement mass, HITS separates DIRECTORY
    hosts (hubs — link to many good sources) from CONTENT hosts
    (authorities — linked by many good directories), which is the signal
    a crawl-frontier or source-weighting pass actually wants.

        a_i(v) = Σ_{(u,v)} hub_{i-1}(u)·w   then  a_i ← (a_i·S) div max(a_i)
        h_i(u) = Σ_{(u,v)} auth_i(v)·w      then  h_i ← (h_i·S) div max(h_i)

    Normalization is L∞ (divide by the round's max) instead of the
    textbook L2: per-round normalization in HITS is only there to stop
    magnitude growth, any positive scaling yields the same ORDER and the
    same fixed-point direction — and an integer max is exact where a
    sqrt is irrational, so two engines running the same rounds produce
    bit-identical tables (the pagerank_e12 recipe; summation is integer,
    order-free).

    Scale shape: identical to pagerank_e12 — edges are the aggregated
    vocabulary-scale node graph; each half-round is one broadcast-
    eligible join of a node-sized score table onto the edge list plus
    one integer aggregate; score frames are materialized per round so
    round k+1 never replays rounds 1..k.  The max is a 1-row aggregate
    broadcast back (the s10 broadcast-scalar shape).

    Overflow bound: Σ score·w per node ≤ HITS_SCALE · (max weighted
    degree) must stay < 2^63 — holds while any node's weighted in/out
    degree < 9.2e12; e6 (not e12) scale is exactly this headroom trade.
    The normalization step then multiplies that sum by HITS_SCALE again,
    which would overflow int64 at weighted degree ~9.2e6, so the scaled
    quotient is computed in DECIMAL(38,0) (HUGEINT in the DuckDB twin) —
    the quotient itself is ≤ HITS_SCALE and always fits a long.

    Weights must be NON-NEGATIVE: Spark ``div`` truncates toward zero
    while DuckDB ``//`` floors, so negative scores would diverge across
    engines (and an L∞-by-max normalization is meaningless under mixed
    signs).  The grouped weight table is validated at build time and a
    negative aggregate weight raises ValueError.

    Returns (node, hub_e6, auth_e6) over every node appearing as src or
    dst; sink nodes get hub 0, source nodes auth 0.

    Reference: no analogue (beyond-reference LLM-data surface, the
    operators/graph.py family)."""
    if iters < 1:
        raise ValueError(f"hits_e6 requires iters >= 1, got {iters}")
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    e = edges.select(
        F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst"),
        w.alias("__w"),
    )
    e = materialize(
        e.groupBy("__src", "__dst").agg(F.sum("__w").alias("__w"))
    )
    min_w = e.agg(F.min("__w").alias("__mw")).collect()[0]["__mw"]
    if min_w is not None and min_w < 0:
        raise ValueError(
            "hits_e6 requires non-negative aggregate edge weights "
            f"(min grouped weight = {min_w}): trunc-div (Spark) vs "
            "floor-div (DuckDB/Python) diverge on negatives and "
            "max-normalization is undefined under mixed signs"
        )
    nodes = materialize(
        e.select(F.col("__src").alias("node"))
        .unionByName(e.select(F.col("__dst").alias("node")))
        .distinct()
    )
    hub = nodes.select(
        "node", F.lit(HITS_SCALE).cast("long").alias("hub_e6")
    )

    def _normalized(scored, score_col):
        # The raw sum is bounded by HITS_SCALE·wdeg; multiplying by
        # HITS_SCALE again would overflow int64 at wdeg ~9.2e6, so widen
        # to DECIMAL(38,0) for the product — the quotient is ≤ HITS_SCALE
        # (score ≤ max) and casts back to long losslessly.
        mx = scored.agg(F.max(score_col).alias("__mx"))
        return scored.crossJoin(F.broadcast(mx)).select(
            "node",
            F.expr(
                f"(cast({score_col} as decimal(38,0)) * {HITS_SCALE})"
                " div greatest(__mx, 1)"
            )
            .cast("long")
            .alias(score_col),
        )

    auth = None
    for _ in range(iters):
        a_raw = (
            e.join(hub, e["__src"] == hub["node"])
            .select(
                F.col("__dst").alias("node"),
                (F.col("hub_e6") * F.col("__w")).alias("__m"),
            )
            .groupBy("node")
            .agg(F.sum("__m").alias("auth_e6"))
        )
        auth = materialize(_normalized(a_raw, "auth_e6"))
        h_raw = (
            e.join(auth, e["__dst"] == auth["node"])
            .select(
                F.col("__src").alias("node"),
                (F.col("auth_e6") * F.col("__w")).alias("__m"),
            )
            .groupBy("node")
            .agg(F.sum("__m").alias("hub_e6"))
        )
        hub = materialize(_normalized(h_raw, "hub_e6"))
    return (
        nodes.join(hub, "node", "left")
        .join(auth, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("hub_e6"), F.lit(0)).cast("long")
            .alias("hub_e6"),
            F.coalesce(F.col("auth_e6"), F.lit(0)).cast("long")
            .alias("auth_e6"),
        )
    )


def hits_oracle_sql(edges_sql: str, iters: int = 3) -> str:
    """DuckDB twin of ``hits_e6``: the same half-rounds unrolled as CTEs
    over an edge-list subquery producing (src, dst, w).  Integer-exact —
    bit-identical, not approximately equal."""
    rounds = []
    prev_hub = "h0"
    for i in range(1, iters + 1):
        rounds.append(f"""
    a{i}r AS (
        SELECT e.dst AS node,
               CAST(sum(h.hub_e6 * e.w) AS BIGINT) AS s
        FROM e JOIN {prev_hub} h ON h.node = e.src
        GROUP BY e.dst),
    a{i} AS (
        SELECT node,
               CAST((CAST(s AS HUGEINT) * {HITS_SCALE})
                    // greatest((SELECT max(s) FROM a{i}r), 1) AS BIGINT)
                   AS auth_e6
        FROM a{i}r),
    h{i}r AS (
        SELECT e.src AS node,
               CAST(sum(a.auth_e6 * e.w) AS BIGINT) AS s
        FROM e JOIN a{i} a ON a.node = e.dst
        GROUP BY e.src),
    h{i} AS (
        SELECT node,
               CAST((CAST(s AS HUGEINT) * {HITS_SCALE})
                    // greatest((SELECT max(s) FROM h{i}r), 1) AS BIGINT)
                   AS hub_e6
        FROM h{i}r)""")
        prev_hub = f"h{i}"
    return f"""
    WITH eraw AS ({edges_sql}),
    e AS (SELECT src, dst, CAST(sum(w) AS BIGINT) AS w
          FROM eraw GROUP BY src, dst),
    nodes AS (SELECT DISTINCT src AS node FROM e
              UNION SELECT DISTINCT dst FROM e),
    h0 AS (SELECT node, CAST({HITS_SCALE} AS BIGINT) AS hub_e6 FROM nodes),
    {','.join(rounds)}
    SELECT n.node,
           CAST(coalesce(h.hub_e6, 0) AS BIGINT) AS hub_e6,
           CAST(coalesce(a.auth_e6, 0) AS BIGINT) AS auth_e6
    FROM nodes n
    LEFT JOIN h{iters} h ON h.node = n.node
    LEFT JOIN a{iters} a ON a.node = n.node
    """


def pagerank_oracle_sql(
    edges_sql: str,
    iters: int = 5,
    damping_pct: int = 85,
) -> str:
    """DuckDB twin of ``pagerank_e12``: the same rounds unrolled as CTEs
    over an edge-list subquery producing (src, dst, w).  Integer-exact,
    so the twin is bit-identical, not approximately equal."""
    keep = 100 - damping_pct
    rounds = []
    prev = "r0"
    for i in range(1, iters + 1):
        rounds.append(f"""
    c{i} AS (
        SELECT e.dst AS node,
               CAST(sum((CAST(r.rank_e12 AS HUGEINT) * e.w) // od.ow)
                    AS BIGINT) AS s
        FROM e JOIN {prev} r ON r.node = e.src
        JOIN outdeg od ON od.src = e.src
        GROUP BY e.dst),
    r{i} AS (
        SELECT b.node,
               CAST(({keep} * b.base + {damping_pct} * coalesce(c{i}.s, 0))
                    // 100 AS BIGINT) AS rank_e12
        FROM base b LEFT JOIN c{i} ON c{i}.node = b.node)""")
        prev = f"r{i}"
    return f"""
    WITH eraw AS ({edges_sql}),
    e AS (SELECT src, dst, CAST(sum(w) AS BIGINT) AS w
          FROM eraw GROUP BY src, dst),
    nodes AS (SELECT DISTINCT src AS node FROM e
              UNION SELECT DISTINCT dst FROM e),
    n AS (SELECT count(*) AS c FROM nodes),
    outdeg AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM e GROUP BY src),
    base AS (SELECT node, CAST({RANK_SCALE} // c AS BIGINT) AS base
             FROM nodes, n),
    r0 AS (SELECT node, base AS rank_e12 FROM base),
    {','.join(rounds)}
    SELECT node, rank_e12 FROM {prev}
    """
