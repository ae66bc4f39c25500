"""Local mirror of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, compares row count, column names, and an order-insensitive
value multiset (values canonicalized: floats rounded, timestamps stringified).

Usage: python tools/check_correctness.py [--sf DIR] [name_prefix ...]

The scale factor comes from ``--sf`` or the ``SPARK_GRAFT_T2_DIR`` env var
(default sf0.01).  ``--sf`` exists because a bare ``--sf DIR`` pair used to
be swallowed as two never-matching name prefixes, silently reporting
"0 pass, 0 fail" — an invocation that looks like a green all-SF sweep and
checks nothing (caught r9).  Unknown ``--`` flags now fail loudly.
"""

from __future__ import annotations

import math
import os
import sys
import time
from collections import Counter
from datetime import date, datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_T2_DIR", "/root/testdata/sf0.01")


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (datetime, date)):
        return str(v)
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    if isinstance(v, bool):
        return int(v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except ImportError:
        pass
    return v


def row_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    import duckdb

    from __spark_entry__ import oracle_sql, queries
    from ago_sisdb_spark.inventory import extended_oracles, extended_queries
    from ago_sisdb_spark.session import get_spark

    global SF_DIR
    args = sys.argv[1:]
    prefixes = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            if i + 1 >= len(args):
                sys.exit("--sf requires a directory argument")
            SF_DIR = args[i + 1]
            i += 2
        elif args[i].startswith("--"):
            sys.exit(f"unknown flag {args[i]!r} (only --sf DIR is supported)")
        else:
            prefixes.append(args[i])
            i += 1
    if prefixes and not prefixes[0].strip():
        sys.exit("empty prefix")
    spark = get_spark()
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    # driver-facing entries first, then the fine-grained extended registry
    # (kept for localization — the driver only sees the first group)
    qs, oracles = queries(), oracle_sql()
    qs.update(extended_queries())
    oracles.update(extended_oracles())
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in sorted(qs.items()):
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows ({dt:.1f}s) [rows-only]")
            n_rowsonly += 1
            if len(srows) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        try:
            rel = con.execute(oracles[name])
            dcols = [d[0] for d in rel.description]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if not problems:
            sm, dm = row_multiset(srows, scols), row_multiset(drows, dcols)
            if sm != dm:
                diff = (sm - dm) + (dm - sm)
                sample = list(diff.items())[:3]
                problems.append(f"values differ ({sum(diff.values())} rows): {sample}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows ({dt:.1f}s)")
            n_pass += 1
    if n_pass + n_fail + n_rowsonly == 0:
        print(f"\nERROR: no registry entry matches prefixes {prefixes!r}")
        return 2
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
