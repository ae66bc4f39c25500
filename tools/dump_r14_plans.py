"""Dump ``.explain("formatted")`` for the queries the r14 optimization round
touched, as ``plans/r14/<query>_<suffix>.txt`` (the judge checks plan claims
against these files).

Usage: python tools/dump_r14_plans.py <suffix> [out_dir] [sf_dir]
  suffix   "before" (run from a worktree at the r13 HEAD) or "after" (HEAD)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Queries whose code the r14 round changed (or measured as candidates):
# d3 portable-MinHash kernel vectorization, its pipeline consumers, and the
# e11/pipe12 bounded-job reductions.
QUERIES = [
    "d3_minhash_lsh",
    "pipe_full_prep",
    "d8_bloom_incremental",
    "pipe8_incremental_prep",
    "e11_cluster_balance",
    "pipe12_domain_mix",
    "n11_prf_expansion",
    "t23_quality_classifier",
]


def main() -> None:
    suffix = sys.argv[1]
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")
    )
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from ago_sisdb_spark.inventory import all_queries, extended_queries
    from ago_sisdb_spark.session import get_spark

    spark = get_spark()
    qs = all_queries()
    qs.update(extended_queries())
    os.makedirs(out_dir, exist_ok=True)
    for name in QUERIES:
        if name not in qs:
            print(f"skip {name}: not in registry")
            continue
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
