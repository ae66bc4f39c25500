"""Streaming ingestion-time dedup for the LLM data pipeline (SURVEY §2.11
× §2.9): drop exact-duplicate documents as they arrive, before they ever
land in the corpus.

State design (100 TB mandate): ``dropDuplicatesWithinWatermark`` keys the
state store on the content digest only — 16 bytes per seen document within
the watermark horizon, evicted as the watermark advances.  The horizon is
the dedup guarantee: a duplicate arriving later than ``delay`` after the
original re-enters; the batch `exact_dedup_groups` pass downstream is the
backstop (standard lambda split: cheap online filter + exact offline
sweep).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ago_sisdb_spark.operators.dedup import content_digest


def streaming_content_dedup(
    stream: DataFrame,
    text_col: str,
    time_col: str,
    delay: str = "10 minutes",
) -> DataFrame:
    """Exact content dedup on a stream: digest the body, keep the first
    record per digest within the watermark horizon."""
    return (
        stream.withColumn("__digest", content_digest(F.col(text_col)))
        .withWatermark(time_col, delay)
        .dropDuplicatesWithinWatermark(["__digest"])
        .drop("__digest")
    )
