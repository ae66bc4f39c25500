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
    Overflow bound: rank*weight ≤ RANK_SCALE * w_max must stay < 2^63 —
    holds while any single edge weight < 9.2e6 * 1e6; cap upstream if an
    edge list could exceed it (ANSI mode throws rather than wraps).
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
                F.expr("(rank_e12 * __w) div __ow").cast("long").alias("__c"),
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
               CAST(sum((r.rank_e12 * e.w) // od.ow) AS BIGINT) AS s
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
