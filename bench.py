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
]

RUNS = 3


def main() -> None:
    from ago_sisdb_spark.inventory import all_queries, extended_queries
    from ago_sisdb_spark.session import get_spark

    # optional set filter: `python bench.py secondary` re-measures only the
    # secondary table (the r5-verdict de-noise check runs it twice and
    # compares), `headline` only the headline total; default both.
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark(app_name="ago_sisdb_bench")
    queries = all_queries()
    queries.update(extended_queries())

    def median_time(name: str) -> float:
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

    timings = (
        {name: median_time(name) for name in HEADLINE}
        if which in ("all", "headline")
        else {}
    )
    secondary = (
        {name: median_time(name) for name in SECONDARY}
        if which in ("all", "secondary")
        else {}
    )

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline query wall time at sf (median of 3, local[N])",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "secondary": secondary,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
