"""P6 last-per-key: agg (max_by) and window strategies must agree."""

from __future__ import annotations

from pyspark.sql import functions as F

from ago_sisdb_spark.operators import lastper


def _df(spark):
    rows = [
        ("A", 1, 10.0),
        ("A", 3, 30.0),
        ("A", 2, 20.0),
        ("B", 5, 50.0),
        ("B", 4, 40.0),
        ("C", 9, 90.0),
    ]
    return spark.createDataFrame(rows, "sym string, t int, v double")


def test_last_per_key_max_by(spark):
    out = lastper.last_per_key(_df(spark), ["sym"], "t")
    got = {r.sym: (r.t, r.v) for r in out.collect()}
    assert got == {"A": (3, 30.0), "B": (5, 50.0), "C": (9, 90.0)}


def test_strategies_agree(spark):
    df = _df(spark)
    a = lastper.last_per_key(df, ["sym"], "t")
    b = lastper.last_per_key_window(df, ["sym"], [F.col("t")])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_topk_per_key(spark):
    out = lastper.topk_per_key(_df(spark), ["sym"], [F.col("t").desc()], 2)
    got = sorted((r.sym, r.t) for r in out.collect())
    assert got == [("A", 2), ("A", 3), ("B", 4), ("B", 5), ("C", 9)]


def test_topk_global_rank_and_cap(spark):
    """Window-free global top-k: rank order matches (score desc, tie asc),
    the cap holds, and the executed plan has no WindowExec at all."""
    rows = [(f"k{i:02d}", (i * 7) % 5) for i in range(40)]
    df = spark.createDataFrame(rows, "name string, n long")
    out = lastper.topk_global(df, "n", "name", 6)
    got = [(r.rank, r.n, r.name) for r in out.collect()]
    want = sorted(rows, key=lambda t: (-t[1], t[0]))[:6]
    assert got == [(i + 1, n, name) for i, (name, n) in enumerate(want)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "TakeOrderedAndProject" in plan


def test_topk_global_empty_input(spark):
    df = spark.createDataFrame([], "name string, n long")
    assert lastper.topk_global(df, "n", "name", 5).count() == 0


def test_global_rank_matches_single_partition_row_number(spark):
    """Distributed range-partitioned ranking == the single-partition
    row_number ground truth, including heavy ties (the hapax-pile shape
    of a Zipf vocabulary), across partition counts."""
    rows = [(f"t{i:03d}", 1 if i < 150 else (i % 9) + 2) for i in range(200)]
    df = spark.createDataFrame(rows, "term string, n long")
    want = {
        name: i + 1
        for i, (name, _) in enumerate(
            sorted(rows, key=lambda t: (-t[1], t[0]))
        )
    }
    for p in (1, 4, 32):
        out = lastper.global_rank(
            df, [F.desc("n"), F.col("term")], num_partitions=p
        )
        got = {r.term: r.rank for r in out.collect()}
        assert got == want, f"num_partitions={p}"


def test_span_cache_bounded_and_releasable(spark):
    """global_rank/global_prefix_sums pin their range-partitioned frame in
    a bounded FIFO: repeated invocations hold at most _SPAN_CACHE_MAX
    cached frames (no session-lifetime leak), and release_span_cache()
    drops them all."""
    lastper.release_span_cache()
    df = spark.createDataFrame(
        [(f"k{i:02d}", i) for i in range(40)], "term string, n long"
    )
    for _ in range(lastper._SPAN_CACHE_MAX + 3):
        lastper.global_rank(df, [F.col("term")], num_partitions=4).count()
    assert len(lastper._SPAN_CACHE) == lastper._SPAN_CACHE_MAX
    lastper.global_prefix_sums(
        df, [F.col("term")], ["n"], num_partitions=4
    ).count()
    assert len(lastper._SPAN_CACHE) == lastper._SPAN_CACHE_MAX
    assert lastper.release_span_cache() == lastper._SPAN_CACHE_MAX
    assert lastper._SPAN_CACHE == []

    # correctness unaffected by an eviction mid-stream: rank again after
    # the cache was fully released
    out = lastper.global_rank(df, [F.col("term")], num_partitions=4)
    got = {r.term: r.rank for r in out.collect()}
    assert got == {f"k{i:02d}": i + 1 for i in range(40)}
    lastper.release_span_cache()
