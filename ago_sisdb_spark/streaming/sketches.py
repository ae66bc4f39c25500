"""Streaming sketch maintenance: the count-min cells kept live across
micro-batches (SURVEY §2.11 × §2.9).

A mergeable sketch is the natural streaming aggregate: the ingest stream
updates cells incrementally, and because CMS merge is cell-wise addition,
the state after any number of micro-batches equals ``cms_build`` over
everything ingested so far — the property the batch tests pin and the
stream test re-pins end-to-end.  State is bounded at depth×width cells
(one long each) no matter how much data flows through: the ingest-side
frequency monitor that never grows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from ago_sisdb_spark.operators.sketch import cms_positions


def streaming_cms(
    stream: DataFrame,
    term_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Maintain count-min cells over a term stream with
    ``applyInPandasWithState`` keyed by (row, bucket).

    Each micro-batch emits the UPDATED (row, bucket, cnt) rows for the
    cells it touched; untouched cells keep their state silently.  After
    processing batches B1..Bn the latest emitted cnt per cell equals
    ``cms_build(B1 ∪ ... ∪ Bn)`` exactly (cell-wise merge property,
    pinned in tests/test_sketch.py).  Estimates at any point are
    ``cms_estimate`` over the latest cell snapshot.
    """
    cells = stream.select(
        F.posexplode(
            cms_positions(F.col(term_col), depth, width)
        ).alias("row", "bucket")
    )

    def bump(key, pdfs, state):
        import pandas as pd

        n = sum(len(pdf) for pdf in pdfs)
        total = (state.get[0] if state.exists else 0) + n
        state.update((total,))
        yield pd.DataFrame(
            {"row": [key[0]], "bucket": [key[1]], "cnt": [total]}
        )

    return cells.groupBy("row", "bucket").applyInPandasWithState(
        bump,
        outputStructType="row int, bucket long, cnt long",
        stateStructType="cnt long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
