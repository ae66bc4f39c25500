"""Benchmark harness — runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with a full collect (driver-side) to count the
whole pipeline including Arrow transfer.  Warm-up runs once (JVM/codegen
warm), then the median of 3 timed runs per query is reported.
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
# would actually run hot.
HEADLINE = [
    "q1_pricing_summary",     # scan+agg
    "q3_shipping_priority",   # 3-way join
    "a1_ohlcv_rollup",        # time-scale rollup
    "j3_asof_join",           # as-of join
    "j4_range_join",          # interval join
    "p6_last_per_key",        # latest-per-key
    "a12_running_avg",        # window series math
    "d1_dedup_exact",         # exact dedup
    "d3_minhash_lsh",         # near-dup LSH
    "n1_knn_bruteforce",      # similarity search
    "t2_quality_score",       # text analysis
    "s2_time_range_scan",     # pruned range scan
    # r6 (r5 verdict #4): the composite end-to-end prep pipeline (ingest →
    # exact dedup → MinHash prune → decontaminate → quality gate → pack)
    # promoted from secondary — the single number closest to "the product
    # works"; anchored in BASELINE.md's headline table from its r6
    # clean-session median
    "pipe_full_prep",
]

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
]

RUNS = 3

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
    return round(statistics.median(samples), 4)


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
    return {name: _median_time(spark, queries, name) for name in names}


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

    runner = _run_clean if which == "clean" else _run_inline
    timings = runner(HEADLINE) if which in ("all", "headline", "clean") else {}
    secondary = (
        runner(SECONDARY) if which in ("all", "secondary", "clean") else {}
    )

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    label = "clean-session per query" if which == "clean" else "local[N]"
    out = {
        "metric": f"headline query wall time at sf (median of 3, {label})",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "secondary": secondary,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
