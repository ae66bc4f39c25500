"""ago_sisdb_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference time-series database (seerline/ago-sisdb, surveyed in SURVEY.md),
re-expressed Spark-first: DataFrame/SQL plans optimized by Catalyst, Parquet
columnar storage with partition pruning, Structured Streaming for ingest and
pub/sub, and Arrow-batched Pandas UDFs only where built-in operators cannot
express the semantics.

Layout
------
- ``session``    : SparkSession factory with scale-aware defaults
- ``catalog``    : table registry over the parquet test data / any warehouse dir
- ``functions``  : scalar expression library (time codecs, price decimals,
                   safe math, text, vectors)
- ``operators``  : relational + time-series operators (range scan semantics,
                   last-per-key, OHLCV rollup, as-of join, dedup, similarity,
                   series analytics)
- ``plans``      : the user-facing Engine API compiling get/sub-style requests
                   into DataFrame plans
- ``streaming``  : Structured Streaming ingest, replay, pub/sub, rollup
- ``sources``    : batch sources/sinks (parquet, csv, json, dbf, multimodal)
"""

__version__ = "0.1.0"

from ago_sisdb_spark.session import get_spark  # noqa: F401
