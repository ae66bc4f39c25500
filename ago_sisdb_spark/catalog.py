"""Table catalog over a warehouse directory of parquet tables.

The reference addresses data as ``key.sdb`` (entity key + table name,
``workers/sisdb/sisdb.h:44-55``); here a *table* is a parquet dataset and the
entity key is a plain column, so Catalyst gets partition pruning, predicate
pushdown and column pruning for free (SURVEY.md §4).

At 100 TB the same layout holds: each logical table is a date-partitioned,
symbol-bucketed parquet/Delta table; ``load`` only ever issues
``spark.read.parquet`` with pushed filters, never a driver-side scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Driver-provided test tables (TESTDATA.md).
TESTDATA_TABLES = (
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

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class Catalog:
    """Resolve table names to DataFrames rooted at a warehouse directory."""

    def __init__(self, spark: SparkSession, root: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.root = root

    def path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.parquet")

    def load(self, name: str) -> DataFrame:
        return load_table(self.spark, self.root, name)

    def register_views(self, names: tuple[str, ...] = TESTDATA_TABLES) -> None:
        """Register each table as a temp view for spark.sql use."""
        for name in names:
            if os.path.exists(self.path(name)):
                self.load(name).createOrReplaceTempView(name)

    def tables(self) -> list[str]:
        return [
            f[: -len(".parquet")]
            for f in sorted(os.listdir(self.root))
            if f.endswith(".parquet")
        ]


def load_table(spark: SparkSession, root: str, name: str) -> DataFrame:
    """Load a parquet table, normalizing nanosecond timestamps.

    The driver's `events` table stores ts as parquet TIMESTAMP(NANOS), which
    Spark's reader rejects; with the legacy nanosAsLong conf it arrives as
    LongType nanos and is normalized to TimestampType (µs precision — the
    same truncation DuckDB applies).  Integer `div`, not `/`: ns epoch
    values exceed double's 2^53 mantissa, float division rounds the µs.
    W-type µs encodings in the reference normalize identically (SURVEY §1.2).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # timestamp semantics must match the DuckDB oracle (UTC-naive) even when
    # the caller (driver) built the session without our defaults
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(root, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def catalog_for(spark: SparkSession, root: str) -> Catalog:
    """Cheap helper for queries(): a Catalog for (session, dir)."""
    return Catalog(spark, root)
