"""Audit result-schema (dtype) alignment between every Spark query and its
DuckDB oracle — the driver's gate records a schema match bit per query, so
`int` vs `BIGINT` drift matters even when values hash identically.

Usage: python tools/check_schema_alignment.py   (exits 1 on any mismatch)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_T2_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
MAP = {
    "BIGINT": "bigint",
    "INTEGER": "int",
    "DOUBLE": "double",
    "FLOAT": "float",
    "VARCHAR": "string",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "BOOLEAN": "boolean",
    "SMALLINT": "smallint",
    "TINYINT": "tinyint",
}


def main() -> int:
    import duckdb

    from ago_sisdb_spark.inventory import (
        all_oracles,
        all_queries,
        extended_oracles,
        extended_queries,
    )
    from ago_sisdb_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    qs, oracles = all_queries(), all_oracles()
    qs.update(extended_queries())
    oracles.update(extended_oracles())
    bad = 0
    for name, sql in sorted(oracles.items()):
        rel = con.sql(sql)
        dcols = dict(zip(rel.columns, [str(t) for t in rel.types]))
        scols = {
            f.name: f.dataType.simpleString()
            for f in qs[name](spark, SF).schema.fields
        }
        for c, d in dcols.items():
            s = scols.get(c, "<missing>")
            dn = MAP.get(d, d.lower())
            # DuckDB TIMESTAMP is WITHOUT time zone, so Spark timestamp_ntz
            # is an exact semantic match; plain timestamp is also accepted
            # because the session tz is pinned UTC (events.parquet reads
            # natively as TIMESTAMP_NTZ in this environment — r3 verdict #3)
            if dn == "timestamp" and s == "timestamp_ntz":
                continue
            if dn != s and not (dn.startswith("decimal") and s.startswith("decimal")):
                print(f"MISMATCH {name}.{c}: duckdb={d} spark={s}")
                bad += 1
    print(f"{bad} mismatches over {len(oracles)} oracle queries")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
