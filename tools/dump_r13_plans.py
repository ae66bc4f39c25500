"""Dump ``.explain("formatted")`` for the queries the r13 optimization round
touched, as ``plans/r13/<query>_<suffix>.txt`` (the judge checks plan claims
against these files).

Usage: python tools/dump_r13_plans.py <suffix> [out_dir] [sf_dir]
  suffix   "before" (run from a worktree at the r12 HEAD) or "after" (HEAD)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Queries whose code the r13 round changed (kernel vectorizations e10/d5/n1,
# graph fixed-point widening t37/t39).
QUERIES = [
    "e10_bitext_mining",
    "d5_embedding_neardup",
    "n1_knn_bruteforce",
    "t37_host_rank",
    "t39_hits",
]


def main() -> None:
    suffix = sys.argv[1]
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
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
