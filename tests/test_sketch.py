"""Count-min sketch contracts: one-sided error, mergeability, exactness
when the sketch is wide enough, and bounded sketch size."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ago_sisdb_spark.operators import sketch

DEPTH, WIDTH = 4, 512


@pytest.fixture(scope="module")
def stream(spark):
    # term t{i} appears (i+1) times, i in 0..39 → exact counts known
    rows = [(f"t{i}",) for i in range(40) for _ in range(i + 1)]
    return spark.createDataFrame(rows, "term string")


def _estimates(spark, cms, terms):
    probes = spark.createDataFrame([(t,) for t in terms], "term string")
    return {
        r.term: r.est
        for r in sketch.cms_estimate(cms, probes, "term", DEPTH, WIDTH).collect()
    }


def test_one_sided_and_exact_when_sparse(spark, stream):
    """est >= true always; with 40 distinct terms in 4x512 cells the
    collision probability is tiny, so est == true here."""
    cms = sketch.cms_build(stream, "term", DEPTH, WIDTH)
    est = _estimates(spark, cms, [f"t{i}" for i in range(40)])
    for i in range(40):
        assert est[f"t{i}"] == i + 1


def test_absent_term_estimates_zero_or_overcount(spark, stream):
    cms = sketch.cms_build(stream, "term", DEPTH, WIDTH)
    est = _estimates(spark, cms, ["never-seen"])
    assert est["never-seen"] >= 0  # one-sided: never negative


def test_merge_equals_single_pass(spark, stream):
    """Sketch(A) + Sketch(B) must equal Sketch(A ∪ B) cell-for-cell —
    the property that lets daily sketches roll up without re-scanning."""
    a = stream.limit(300)
    b = stream.exceptAll(a)
    cms_ab = sketch.cms_merge(
        sketch.cms_build(a, "term", DEPTH, WIDTH),
        sketch.cms_build(b, "term", DEPTH, WIDTH),
    )
    cms_full = sketch.cms_build(stream, "term", DEPTH, WIDTH)
    merged = {(r.row, r.bucket): r.cnt for r in cms_ab.collect()}
    full = {(r.row, r.bucket): r.cnt for r in cms_full.collect()}
    assert merged == full


def test_sketch_size_bounded(spark):
    """1000 distinct heavy terms into a 2x16 sketch: cells <= depth*width
    no matter the stream size (the whole point at 100 TB)."""
    rows = [(f"term{i}",) for i in range(1000)]
    df = spark.createDataFrame(rows, "term string")
    cms = sketch.cms_build(df, "term", depth=2, width=16)
    assert cms.count() <= 2 * 16


def test_weighted_build_matches_exploded(spark):
    """weight_col path == pre-exploded path (saves the explode upstream)."""
    occ = spark.createDataFrame(
        [("x", 3), ("y", 5), ("z", 1)], "term string, n int"
    )
    exploded = spark.createDataFrame(
        [("x",)] * 3 + [("y",)] * 5 + [("z",)], "term string"
    )
    w = {
        (r.row, r.bucket): r.cnt
        for r in sketch.cms_build(occ, "term", DEPTH, WIDTH, weight_col="n").collect()
    }
    e = {
        (r.row, r.bucket): r.cnt
        for r in sketch.cms_build(exploded, "term", DEPTH, WIDTH).collect()
    }
    assert w == e


def test_streaming_cms_matches_batch(spark, tmp_path):
    """The applyInPandasWithState cells carried across micro-batches must
    equal cms_build over everything ingested — the streaming face of the
    merge property."""
    import glob
    import os
    import time

    from ago_sisdb_spark.streaming.sketches import streaming_cms

    rows1 = [(f"t{i % 15}",) for i in range(200)]
    rows2 = [(f"t{i % 25}",) for i in range(150)]
    b1 = spark.createDataFrame(rows1, "term string")
    b2 = spark.createDataFrame(rows2, "term string")

    src = str(tmp_path / "src")
    b1.coalesce(1).write.parquet(src)
    files1 = glob.glob(src + "/part-*")
    b2.coalesce(1).write.mode("append").parquet(src)
    files2 = [f for f in glob.glob(src + "/part-*") if f not in files1]
    now = time.time()
    for f in files1:
        os.utime(f, (now - 200, now - 200))
    for f in files2:
        os.utime(f, (now - 100, now - 100))

    latest = {}

    def sink(df, epoch_id):
        for r in df.collect():
            latest[(r.row, r.bucket)] = r.cnt

    stream = (
        spark.readStream.schema("term string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        streaming_cms(stream, "term", DEPTH, WIDTH)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()

    full = sketch.cms_build(b1.unionByName(b2), "term", DEPTH, WIDTH)
    expected = {(r.row, r.bucket): r.cnt for r in full.collect()}
    assert latest == expected


def test_hist_quantiles_accuracy_and_bounds(spark):
    """Uniform 0..999: every estimate within one bin width (1000/32) of the
    true quantile; constant group reports the constant."""
    rows = [("u", float(i)) for i in range(1000)] + [("c", 7.0)] * 40
    df = spark.createDataFrame(rows, "g string, v double")
    out = {(r.g, r.q): r for r in sketch.hist_quantiles(df, "g", "v").collect()}
    binw = 999.0 / 32
    for q in (0.5, 0.9, 0.99):
        est = out[("u", q)].est
        assert abs(est - q * 999.0) <= binw + 1e-6, (q, est)
        assert out[("c", q)].est == 7.0
    assert out[("u", 0.5)].n == 1000


def test_hist_quantiles_monotone_in_q(spark):
    import random

    rnd = random.Random(5)
    rows = [("g", rnd.gauss(50.0, 10.0)) for _ in range(500)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.q: r.est for r in sketch.hist_quantiles(df, "g", "v").collect()}
    assert out[0.5] <= out[0.9] <= out[0.99]


def test_property_hist_quantiles_within_bin_width(spark):
    """Random groups/distributions: every histogram-quantile estimate lies
    within one bin width of the exact interpolated quantile."""
    import random

    rnd = random.Random(23)
    rows = []
    for g, gen in (("gauss", lambda: rnd.gauss(10, 3)),
                   ("exp", lambda: rnd.expovariate(0.2)),
                   ("uni", lambda: rnd.uniform(-5, 5))):
        rows += [(g, gen()) for _ in range(400)]
    df = spark.createDataFrame(rows, "g string, v double")
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    out = sketch.hist_quantiles(df, "g", "v").collect()
    for r in out:
        vals = sorted(by_g[r.g])
        lo, hi = vals[0], vals[-1]
        binw = (hi - lo) / 32
        # exact interpolated quantile
        pos = r.q * (len(vals) - 1)
        f = int(pos)
        exact = vals[f] + (pos - f) * (vals[min(f + 1, len(vals) - 1)] - vals[f])
        assert abs(r.est - exact) <= binw + 1e-9, (r.g, r.q, r.est, exact)


def test_hll_accuracy_and_merge(spark):
    """10k distinct values: estimate within ~5% (1.04/sqrt(1024) ≈ 3.3%
    std error); merged halves == single-pass cells; duplicates don't move
    the estimate."""
    from ago_sisdb_spark.operators.sketch import hll_cells, hll_estimate, hll_merge

    df = spark.createDataFrame([(f"v{i}",) for i in range(10_000)], "x string")
    cells = hll_cells(df, "x")
    est = hll_estimate(cells).collect()[0].est_distinct
    assert abs(est - 10_000) / 10_000 < 0.05, est
    a = spark.createDataFrame([(f"v{i}",) for i in range(5_000)], "x string")
    b = spark.createDataFrame([(f"v{i}",) for i in range(3_000, 10_000)], "x string")
    merged = hll_merge(hll_cells(a, "x"), hll_cells(b, "x"))
    mcells = {(r.bucket): r.max_rho for r in merged.collect()}
    scells = {(r.bucket): r.max_rho for r in cells.collect()}
    assert mcells == scells
    dup = df.unionByName(df)
    est_dup = hll_estimate(hll_cells(dup, "x")).collect()[0].est_distinct
    assert est_dup == est


def test_hll_small_range_linear_counting(spark):
    """A handful of distinct values lands in the linear-counting branch and
    comes back near-exact."""
    from ago_sisdb_spark.operators.sketch import hll_cells, hll_estimate

    df = spark.createDataFrame([(f"k{i % 20}",) for i in range(400)], "x string")
    est = hll_estimate(hll_cells(df, "x")).collect()[0].est_distinct
    assert abs(est - 20) <= 1.0, est
