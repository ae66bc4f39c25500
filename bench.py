"""Benchmark harness — runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with a full collect (driver-side) to count the
whole pipeline including Arrow transfer.  Warm-up runs once (JVM/codegen
warm), then the median of 3 timed runs per query is reported — 5 runs when
the median lands under 1.5 s and 7 under 0.6 s, because two rounds running
the gate artifact was decided by ambient host spread on sub-second anchors
(r9 q1 at 2.00×, r10 p6 at 2.38×, both uniform-host-noise artifacts).

A FROZEN calibration probe (fixed scan+shuffle aggregate over lineitem,
never edited after r11) runs before and after the measured set; its ratio
to the r11 clean-day anchor is reported as ``calibration.host_factor`` so
a uniformly-inflated host day is self-evident in the artifact instead of
needing cross-round forensics.

Self-adjudication (r13, r12 verdict #2; extended to the secondary table
later the same round): any measured query whose trace
probe exceeds ``REQUEUE_TRACE_FACTOR``× the run's own trace median was
measured on a slow host segment — it is automatically RE-MEASURED at the
end of the run (bounded attempts), the reading taken on the cleanest
segment (lowest accompanying trace) is reported, and the raw/retry pairs
land in ``calibration.requeue`` so the artifact adjudicates itself — the
r12 artifact led with a noise-dominated total that needed a manual
same-HEAD re-run to dismiss.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family, the queries a 100 TB deployment
# would actually run hot.  Values are the BASELINE.md headline-table
# anchors (sec at sf0.1) — kept in sync by the CLAUDE.md rule — so the
# artifact can self-report each query's ratio-to-anchor next to the
# calibration host_factor (a 2× reading on a 1.4× host day is then
# adjudicable inside the artifact itself).
HEADLINE_ANCHORS = {
    "q1_pricing_summary": 0.58,   # scan+agg
    "q3_shipping_priority": 0.86, # 3-way join
    "a1_ohlcv_rollup": 0.39,      # time-scale rollup
    "j3_asof_join": 0.51,         # as-of join
    "j4_range_join": 0.49,        # interval join
    "p6_last_per_key": 0.31,      # latest-per-key
    "a12_running_avg": 0.75,      # window series math
    "d1_dedup_exact": 0.22,       # exact dedup
    "d3_minhash_lsh": 1.83,       # near-dup LSH
    "n1_knn_bruteforce": 0.54,    # similarity search
    "t2_quality_score": 0.47,     # text analysis
    "s2_time_range_scan": 0.24,   # pruned range scan
    # r6 (r5 verdict #4): the composite end-to-end prep pipeline (ingest →
    # exact dedup → MinHash prune → decontaminate → quality gate → pack)
    # promoted from secondary — the single number closest to "the product
    # works"; anchored in BASELINE.md's headline table from its r6
    # clean-session median
    "pipe_full_prep": 6.28,
}
HEADLINE = list(HEADLINE_ANCHORS)

# Secondary set (BASELINE.md's second table, tracked round-over-round):
# approximate / pandas-UDF paths whose cost profile differs from the
# expression-only headline queries.  Not part of "value" (headline total
# stays comparable across rounds); reported under "secondary".
SECONDARY = [
    "d6_embedding_neardup_lsh",
    "n4_knn_ivf",
    "a14_turning_points",
    "a8_polyfit",
    "m2_multimodal_features",
    # r3 additions (r3 verdict #7): tracked from r4 on
    "n5_bm25_search",
    "t11_corpus_datacard",
    "t12_bigram_logprob",
    # r4 additions
    "n7_knn_pq",
    "d8_bloom_incremental",
    # r6: the incremental batch-vs-persisted-state prep (pipe_full_prep's
    # daily-ingest twin; measures the screen+pack serve path — the band
    # index is built once and reused like n7's codebooks)
    "pipe8_incremental_prep",
    # r7 (late): the training-corpus sink — shuffle-order pack + sharded
    # ordered write + manifest read-back (the write IS the measured work)
    "s7_training_shards",
    # r7 (continuation): distributed quality-classifier distillation —
    # feature extraction + pyspark.ml L-BFGS fit + expression-only scoring
    # of the corpus (training IS the measured work; serving alone is a
    # plain projection)
    "t23_quality_classifier",
    # r7 (continuation): chunk-level retrieval — CDC chunking + trigram
    # embedding of the whole corpus + 3-query cosine top-k serve in one
    # measured pass (the RAG ingest+serve composite)
    "pipe9_chunk_retrieval",
    # r7 (continuation): the same serve over the PERSISTED chunk index
    # (built once and reused, n7-codebook shape) — the recurring cost
    "pipe10_chunk_index_serve",
    # r9: the full Gopher rule suite (one mapInPandas Counter pass — the
    # per-gram-counting cost profile the expression-only t2/t6 rows lack)
    "t25_gopher_rules",
    # r9: temperature domain mixing (two corpus passes + domains-sized
    # plan broadcast; the deterministic-gate filter family's mix variant)
    "pipe12_domain_mix",
    # r9 continuation: two-stage PRF retrieval (BM25 -> feedback-term
    # mining -> expanded BM25; driver-coordinated stage boundary — the
    # cost profile the single-pass n5 row lacks)
    "n11_prf_expansion",
    # r9 continuation: per-document n-gram novelty (gram-keyed
    # document-frequency join over a shingle pass — the memorization
    # audit's corpus-gram shuffle shape)
    "t33_ngram_novelty",
    # r12 (r11 verdict #2, BASELINE.md "tracked from" rule): the r11
    # embedding-mining family — broadcast+pinned-collapse margin mining,
    # shuffle-free cluster rebalancing, and the symmetric (band, key)
    # bucket join whose occupancy cap landed this round
    "e10_bitext_mining",
    "e11_cluster_balance",
    "e12_bitext_bucketed",
]

RUNS = 3
# (median-after-3-runs cutoff, extra samples): sub-second queries carry
# proportionally the most ambient jitter — a single 0.4 s hiccup doubles a
# 0.3 s anchor reading; more samples make the median robust to it.
EXTRA_RUNS_UNDER = ((0.6, 4), (1.5, 2))

_MODES = ("all", "headline", "secondary", "clean")


def _median_time(spark, queries, name: str) -> float:
    fn = queries[name]
    fn(spark, SF_DIR).collect()  # warm-up (codegen + file listing)
    # settle before the timed samples: a JVM still GC-ing the previous
    # query's shuffle blocks contaminated secondary medians by up to
    # 2× round-over-round (r5 verdict #5) — one explicit GC + a short
    # pause makes consecutive bench runs agree within ±15%
    spark.sparkContext._jvm.System.gc()
    time.sleep(0.3)
    samples = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).collect()
        samples.append(time.perf_counter() - t0)
    extra = next(
        (n for cut, n in EXTRA_RUNS_UNDER if statistics.median(samples) < cut),
        0,
    )
    for _ in range(extra):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).collect()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 4)


# r11 clean-day anchor for the frozen probe below (BASELINE.md
# §calibration): median across 3 fresh sessions, each a self-warmed
# median of 5, measured exactly the way _calibration_probe measures.
# host_factor = probe/anchor ≈ how much slower TODAY'S host is than the
# anchor day on identical frozen work.  (The first r11 probe draft — a
# 6-group lineitem aggregate — was ~0.2 s of work dominated by
# scheduling jitter and swung 0.40-0.73 s across same-day fresh
# sessions; re-frozen the same day on the l_partkey grouping below,
# whose ~20k-group shuffle amortizes scheduling.  No driver artifact
# ever recorded the draft probe.)  Anchor = median of FIVE fresh
# sessions spread over ~20 min: 1.28/1.47/1.11/0.66/0.83 — the 2.2×
# session-to-session spread is the HOST's own ambient variance (same
# box, same code), which is precisely what host_factor exists to
# surface; read factors with that error bar, and prefer the per-query
# trace for localizing WITHIN a run.
CALIBRATION_ANCHOR_SEC = 1.11


def _probe_query(spark) -> None:
    """The frozen probe body: one parquet scan + one ~20k-group shuffle
    aggregate over lineitem — enough real work to amortize scheduling
    jitter (a 6-group variant swung ±60% session-to-session)."""
    from pyspark.sql import functions as F

    spark.read.parquet(
        os.path.join(SF_DIR, "lineitem.parquet")
    ).groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").alias("s"),
        F.avg("l_extendedprice").alias("a"),
    ).agg(
        F.count(F.lit(1)), F.sum("n"), F.avg("s")
    ).collect()


def _calibration_probe(spark) -> float:
    """FROZEN host-speed probe — never edit the query or its sampling
    (editing it invalidates every recorded host_factor): self-warmed,
    median of 5."""
    _probe_query(spark)  # self warm-up
    spark.sparkContext._jvm.System.gc()
    time.sleep(0.3)
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        _probe_query(spark)
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 4)


# one raw probe sample per measured query (headline AND secondary since
# r13 — the secondary table had no protection and a slow segment planted
# t33 at 2.7× its solo reading), recorded as calibration.trace: the
# pre/post probes bracket the RUN, but an ambient disturbance INSIDE
# the window (seen r11: d3 at 5.7x while both probes and q1 read clean)
# is invisible to them — the trace localizes which queries' readings were
# taken on a slow segment.  A single sample, not a median: it is context,
# not a gate.
_PROBE_TRACE: dict[str, float] = {}


def _trace_probe(spark, name: str) -> float:
    t0 = time.perf_counter()
    _probe_query(spark)
    sample = round(time.perf_counter() - t0, 4)
    _PROBE_TRACE[name] = sample
    return sample


# A query (headline or secondary) whose trace probe reads above REQUEUE_TRACE_FACTOR × the run's
# own trace median was measured on a locally-slow host segment (the r11
# d3-at-5.7× / r12 j3-at-2.03× class — both probes clean, one segment
# degraded).  Such queries are re-measured at the END of the run, up to
# MAX_REQUEUE_ATTEMPTS times, keeping the reading whose accompanying
# trace sample is LOWEST (taken on the cleanest segment); every raw and
# retry pair is recorded in calibration.requeue so a future reader can
# adjudicate the artifact without a manual same-HEAD re-run.
REQUEUE_TRACE_FACTOR = 1.5
MAX_REQUEUE_ATTEMPTS = 2
_REQUEUE_LEDGER: dict[str, dict] = {}


def _requeue_noisy(spark, queries, timings: dict[str, float]) -> None:
    trace = {n: t for n, t in _PROBE_TRACE.items() if n in timings}
    if len(trace) < 3:
        return  # a 1-2 query run has no meaningful trace median
    med = statistics.median(trace.values())
    cutoff = REQUEUE_TRACE_FACTOR * med
    for name in [n for n, t in trace.items() if t > cutoff]:
        entry = {
            "raw_sec": timings[name],
            "raw_trace": trace[name],
            "attempts": [],
        }
        best_sec, best_trace = timings[name], trace[name]
        for _ in range(MAX_REQUEUE_ATTEMPTS):
            sec = _median_time(spark, queries, name)
            tr = _trace_probe(spark, name)
            entry["attempts"].append({"sec": sec, "trace": tr})
            if tr < best_trace:
                best_sec, best_trace = sec, tr
            if tr <= cutoff:
                break
        entry["kept_sec"] = best_sec
        entry["kept_trace"] = best_trace
        timings[name] = best_sec
        _PROBE_TRACE[name] = best_trace
        _REQUEUE_LEDGER[name] = entry


def _warm_session(spark, queries, names: list[str]) -> None:
    """Burn first-use JVM costs (class loading, codegen compiler tiering,
    Arrow allocator init, parquet footer cache) on throwaway executions
    BEFORE any timed sample.  One per-query warm run is not enough for
    whichever query happens to run first: on BENCH_r09 that put q1 —
    untouched since r4 — at exactly 2.00× its anchor under host noise
    (r9 verdict #1).  Two rounds of the first query put the first
    measured query in the same warm state as the tenth."""
    for _ in range(2):
        queries[names[0]](spark, SF_DIR).collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(0.3)


def _run_inline(names: list[str]) -> dict[str, float]:
    from ago_sisdb_spark.inventory import all_queries, extended_queries
    from ago_sisdb_spark.session import get_spark

    spark = get_spark(app_name="ago_sisdb_bench")
    queries = all_queries()
    queries.update(extended_queries())
    _warm_session(spark, queries, names)
    out = {}
    for name in names:
        out[name] = _median_time(spark, queries, name)
        # r13 continuation: trace EVERY query, not just the headline set.
        # The secondary table had no trace/requeue protection, so a single
        # slow host segment could plant an unadjudicable reading in the
        # artifact (observed: t33 at 5.18 s in-sequence vs 1.53 s on an
        # immediate solo re-measure — a 2.7× phantom a future reader would
        # have to dismiss by hand, the exact r12-artifact failure mode the
        # requeue machinery exists to kill).
        _trace_probe(spark, name)
    _requeue_noisy(spark, queries, out)
    return out


def _run_clean(names: list[str]) -> dict[str, float]:
    """One FRESH JVM per query (r6 verdict #5): in-sequence runs carry
    GC debt from earlier queries, which made round-over-round headline
    ratios drift 0.97×–1.16× on identical plans; a clean-session sample
    per query is the adjudicable anchor.  Each child re-execs this script
    in `_one` mode and prints {name: sec}."""
    import subprocess

    out: dict[str, float] = {}
    for name in names:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "_one", name],
            capture_output=True, text=True, check=True,
        )
        out.update(json.loads(r.stdout.strip().splitlines()[-1]))
    return out


def main() -> None:
    # set filter: `python bench.py secondary` re-measures only the
    # secondary table (the r5-verdict de-noise check runs it twice and
    # compares), `headline` only the headline total, `clean` both sets
    # with one fresh JVM per query; default both, in-sequence.
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which == "_one":  # internal: clean-mode child, one query per JVM
        print(json.dumps(_run_inline([sys.argv[2]])))
        return
    if which not in _MODES:
        sys.exit(
            f"usage: python bench.py [{'|'.join(_MODES)}]  "
            f"(got {which!r})"
        )

    from ago_sisdb_spark.session import get_spark

    spark = get_spark(app_name="ago_sisdb_bench")
    cal_pre = _calibration_probe(spark)

    runner = _run_clean if which == "clean" else _run_inline
    timings = runner(HEADLINE) if which in ("all", "headline", "clean") else {}
    secondary = (
        runner(SECONDARY) if which in ("all", "secondary", "clean") else {}
    )

    cal_post = _calibration_probe(spark)
    anchor = CALIBRATION_ANCHOR_SEC
    # host_factor compares ONLY the pre probe to the anchor: both run in a
    # fresh session warmed solely by the probe itself.  The post probe
    # runs in a fully JIT/cache-warmed JVM and reads systematically lower
    # (~0.2 vs 0.44 anchor) — it is reported as a within-run drift signal,
    # never folded into the factor.
    factor = round(cal_pre / anchor, 3) if anchor else None

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    label = "clean-session per query" if which == "clean" else "local[N]"
    out = {
        "metric": (
            f"headline query wall time at sf (median of 3-7, {label})"
        ),
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "secondary": secondary,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # host-speed self-report: judge per-query ratios against
        # anchor*host_factor, not the raw anchor.  No boolean verdict
        # (r12, ADVICE fix): the anchor's own five same-day fresh-session
        # samples span 0.66–1.47 s (2.2× ambient spread, BASELINE.md), so
        # any fixed host_factor threshold inside that band both
        # false-positives on a clean day and misses a genuinely inflated
        # one — readers get the factor WITH its error bar plus the
        # per-query trace, and adjudicate per query.
        "calibration": {
            "pre_sec": cal_pre,
            "post_sec": cal_post,
            "anchor_sec": anchor,
            "host_factor": factor,
            # per-query ambient context (single raw probe sample taken
            # right after each headline query).  Trace samples run in the
            # fully warm in-sequence JVM, so they read well BELOW the
            # fresh-session anchor — compare them against EACH OTHER: a
            # clean run's trace is flat (~0.3 s band); entries several×
            # the run's own trace median mark queries measured on a slow
            # host segment (the r11 30.7 s run would have shown exactly
            # that around d3..s2)
            "trace": dict(_PROBE_TRACE),
            # self-adjudication ledger (r13): queries re-measured because
            # their trace exceeded REQUEUE_TRACE_FACTOR × the run's trace
            # median, with every raw/retry (sec, trace) pair.  "queries"
            # and "trace" above already hold the KEPT readings.
            "requeue": {
                "trace_factor": REQUEUE_TRACE_FACTOR,
                "max_attempts": MAX_REQUEUE_ATTEMPTS,
                "ledger": dict(_REQUEUE_LEDGER),
            },
        },
        # per-query ratio to the BASELINE.md anchor (sf0.1 protocol only —
        # other SFs have no anchors, ratios omitted)
        "ratio_to_anchor": (
            {
                name: round(sec / HEADLINE_ANCHORS[name], 2)
                for name, sec in timings.items()
                if name in HEADLINE_ANCHORS
            }
            if str(sf) == "0.1"
            else {}
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
