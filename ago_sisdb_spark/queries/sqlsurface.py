"""SQL-surface parity — every §2 operator reachable from ``spark.sql``.

The reference exposes its query surface over a wire protocol; SURVEY §3.1
maps that to the SparkSession, which means the SECOND public surface —
beside the Python DataFrame builders — is plain SQL over registered views.
``register_views`` is the one-call bridge: it registers the ten catalog
tables as temp views so any ANSI query (including every oracle string in
the inventory, which is exactly such a query) runs via ``spark.sql``.

The parity entry below replays the flagship q1 oracle string (the SAME
text DuckDB executes as the gate's oracle) through ``spark.sql`` over the
registered views — an oracle-checked round trip proving text-SQL in ==
hash-identical result out.  Catalyst plans the SQL text and the DataFrame
builder into the same physical plan (pushed scan + partial agg), so the
SQL path inherits every plan-audit guarantee for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ago_sisdb_spark.inventory import _t, query
from ago_sisdb_spark.queries.aggregates import Q1_SQL

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> None:
    """Register the catalog tables as session temp views (idempotent).

    Temp-view registration is metadata-only — no scan, no materialization;
    predicate pushdown and partition pruning still reach the parquet scan
    through the view, exactly as for the DataFrame path."""
    for name in tables:
        _t(spark, sf_dir, name).createOrReplaceTempView(name)


@query("sql_surface_q1", oracle=Q1_SQL, extended=True)
def sql_surface_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2 reachable from SQL (r9 verdict #6): the flagship scan+agg run as
    a TEXT query — ``spark.sql(Q1_SQL)`` over ``register_views`` — and
    hash-checked against DuckDB executing the IDENTICAL string."""
    register_views(spark, sf_dir)
    return spark.sql(Q1_SQL)
