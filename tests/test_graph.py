"""pagerank_e12 (operators/graph): exact integer fixed-point PageRank —
cross-checked against an independent plain-Python twin replaying the same
integer arithmetic, plus the authority-ordering property."""

from __future__ import annotations

from collections import defaultdict

import pytest

from ago_sisdb_spark.operators import graph


def _twin(edges, iters, damping_pct=85):
    w = defaultdict(int)
    for s, t, ww in edges:
        w[(s, t)] += ww
    nodes = sorted({s for s, _ in w} | {t for _, t in w})
    ow = defaultdict(int)
    for (s, _), ww in w.items():
        ow[s] += ww
    base = graph.RANK_SCALE // len(nodes)
    rank = {n: base for n in nodes}
    keep = 100 - damping_pct
    for _ in range(iters):
        contrib = defaultdict(int)
        for (s, t), ww in w.items():
            contrib[t] += (rank[s] * ww) // ow[s]
        rank = {
            n: (keep * base + damping_pct * contrib.get(n, 0)) // 100
            for n in nodes
        }
    return rank


@pytest.mark.parametrize("iters", [1, 3, 5])
def test_pagerank_matches_integer_twin(spark, iters):
    edges = [
        ("a", "hub", 3), ("b", "hub", 1), ("c", "hub", 2),
        ("hub", "a", 1), ("a", "b", 1), ("c", "leafless", 1),
        ("b", "b", 2),  # self-loop
        ("a", "hub", 2),  # duplicate edge -> aggregated weight 5
    ]
    df = spark.createDataFrame(edges, "s string, t string, w long")
    got = {
        r["node"]: r["rank_e12"]
        for r in graph.pagerank_e12(df, "s", "t", "w", iters=iters).collect()
    }
    assert got == _twin(edges, iters)


def test_pagerank_authority_ordering(spark):
    """A node every spoke links to must out-rank every spoke; a node
    receiving no links sits at the damped base floor."""
    edges = [(f"s{i}", "hub", 1) for i in range(6)] + [("hub", "s0", 1)]
    df = spark.createDataFrame(edges, "s string, t string, w long")
    got = {
        r["node"]: r["rank_e12"]
        for r in graph.pagerank_e12(df, "s", "t", "w", iters=3).collect()
    }
    assert got == _twin(edges, 3)
    floor = (15 * (graph.RANK_SCALE // len(got))) // 100
    assert got["hub"] > got["s0"] > got["s1"]  # s0 gets hub's mass back
    assert got["s1"] == floor  # no in-links -> exact damped base
    assert len(got) == 7


def test_pagerank_rejects_bad_damping(spark):
    df = spark.createDataFrame([("a", "b", 1)], "s string, t string, w long")
    with pytest.raises(ValueError):
        graph.pagerank_e12(df, "s", "t", "w", damping_pct=0)
    with pytest.raises(ValueError):
        graph.pagerank_e12(df, "s", "t", "w", damping_pct=100)


def test_pagerank_survives_large_edge_weight(spark):
    """Regression (r13, the hits_e6 ADVICE class applied to pagerank):
    a rank can approach the full 1e12 mass, so rank·w overflowed int64
    at aggregated edge weight ~9.2e6 (ANSI crash); the DECIMAL(38,0)
    contribution product must match the arbitrary-precision twin."""
    big = 100_000_000
    edges = [("a", "b", big), ("c", "b", big // 2), ("b", "a", 3)]
    df = spark.createDataFrame(edges, "s string, t string, w long")
    got = {
        r["node"]: r["rank_e12"]
        for r in graph.pagerank_e12(df, "s", "t", "w", iters=3).collect()
    }
    assert got == _twin(edges, 3)


def test_pagerank_rejects_negative_weights(spark):
    df = spark.createDataFrame(
        [("a", "b", 2), ("a", "c", -1)], "s string, t string, w long"
    )
    with pytest.raises(ValueError, match="non-negative"):
        graph.pagerank_e12(df, "s", "t", "w")


def _hits_twin(edges, iters):
    """Independent plain-Python replay of hits_e6's integer arithmetic."""
    w = defaultdict(int)
    for s, t, ww in edges:
        w[(s, t)] += ww
    nodes = sorted({s for s, _ in w} | {t for _, t in w})
    hub = {n: graph.HITS_SCALE for n in nodes}
    auth = {}
    for _ in range(iters):
        a = defaultdict(int)
        for (s, t), ww in w.items():
            if s in hub:
                a[t] += hub[s] * ww
        mx = max(a.values(), default=0) or 1
        auth = {n: (v * graph.HITS_SCALE) // mx for n, v in a.items()}
        h = defaultdict(int)
        for (s, t), ww in w.items():
            if t in auth:
                h[s] += auth[t] * ww
        mx = max(h.values(), default=0) or 1
        hub = {n: (v * graph.HITS_SCALE) // mx for n, v in h.items()}
    return {
        n: (hub.get(n, 0), auth.get(n, 0)) for n in nodes
    }


@pytest.mark.parametrize("iters", [1, 3])
def test_hits_matches_integer_twin(spark, iters):
    edges = [
        ("d1", "c1", 2), ("d1", "c2", 1), ("d1", "c3", 1),
        ("d2", "c1", 1), ("d2", "c2", 1),
        ("d3", "c3", 1), ("c1", "d1", 1),  # back-link: c1 is also a hub
        ("d1", "c1", 1),  # duplicate edge -> aggregated weight 3
    ]
    df = spark.createDataFrame(edges, "s string, t string, w long")
    got = {
        r["node"]: (r["hub_e6"], r["auth_e6"])
        for r in graph.hits_e6(df, "s", "t", "w", iters=iters).collect()
    }
    assert got == _hits_twin(edges, iters)


def test_hits_separates_hubs_from_authorities(spark):
    """On a bipartite directory→content graph: the directory linking to
    every content node is the top hub with zero authority; the content
    node every directory links to is the top authority with zero hub;
    L-infinity normalization pins both maxima at exactly HITS_SCALE."""
    edges = (
        [("dir_all", f"c{i}", 1) for i in range(4)]
        + [("dir_half", "c0", 1), ("dir_half", "c1", 1)]
    )
    df = spark.createDataFrame(edges, "s string, t string, w long")
    got = {
        r["node"]: (r["hub_e6"], r["auth_e6"])
        for r in graph.hits_e6(df, "s", "t", iters=3).collect()
    }
    assert got["dir_all"][0] == graph.HITS_SCALE  # top hub, exact scale
    assert got["dir_all"][1] == 0                 # no in-links -> no authority
    assert got["c0"][1] == graph.HITS_SCALE       # top authority (2 in-links)
    assert got["c0"][0] == 0                      # no out-links -> no hub
    assert got["dir_all"][0] > got["dir_half"][0]
    assert got["c0"][1] > got["c2"][1]


def test_hits_survives_large_weighted_degree(spark):
    """Regression (r13 ADVICE): normalization multiplies the half-round
    sum (≤ HITS_SCALE·wdeg) by HITS_SCALE again — at weighted degree
    ~1e8 the int64 product would overflow and ANSI mode would crash;
    the DECIMAL(38,0)-widened quotient must match the (arbitrary-
    precision) Python twin exactly."""
    big = 100_000_000  # wdeg 1e8 -> s*SCALE ~ 1e20 > 2^63
    edges = [("d1", "c1", big), ("d1", "c2", big // 2), ("d2", "c1", 7)]
    df = spark.createDataFrame(edges, "s string, t string, w long")
    got = {
        r["node"]: (r["hub_e6"], r["auth_e6"])
        for r in graph.hits_e6(df, "s", "t", "w", iters=2).collect()
    }
    assert got == _hits_twin(edges, 2)
    assert got["d1"][0] == graph.HITS_SCALE


def test_hits_rejects_negative_weights_and_zero_iters(spark):
    df = spark.createDataFrame(
        [("a", "b", 1), ("a", "c", -2)], "s string, t string, w long"
    )
    with pytest.raises(ValueError, match="non-negative"):
        graph.hits_e6(df, "s", "t", "w", iters=2)
    ok = spark.createDataFrame([("a", "b", 1)], "s string, t string, w long")
    with pytest.raises(ValueError, match="iters"):
        graph.hits_e6(ok, "s", "t", "w", iters=0)
