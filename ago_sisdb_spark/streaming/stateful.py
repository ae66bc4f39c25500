"""Custom stateful streaming operator: per-key incremental running stats
via ``applyInPandasWithState``.

Reference analogue: the incremental average objects ``s_ai_avg_m`` /
``s_ai_avg_r`` (`src/core/ai/sis_ai.h:46-64`) that each key updates in
place as rows arrive, with a warm-up cap.  Batch-side the same math is a
window (`a12_running_avg`); stream-side it needs true keyed state that
survives micro-batches — exactly what ``applyInPandasWithState`` provides:
state partitioned by key, Arrow-batched updates, timeout-based eviction.

At scale: state lives in the state store (RocksDB-backed on a cluster),
partitioned with the shuffle — no driver involvement, keys distribute
across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "key string, n bigint, mean double, m2 double, last double"
STATE_SCHEMA = "n bigint, mean double, m2 double, last double"


def _update(key, pdfs, state: GroupState):
    """Welford update of (count, mean, M2) per key + last value.

    Welford is the numerically-stable incremental form of the reference's
    ``avgm->avgv = (avgv*(n-1) + v)/n`` loop; M2/(n-1) is the running
    sample variance (pairs with A4)."""
    import pandas as pd

    if state.exists:
        n, mean, m2, last = state.get
    else:
        n, mean, m2, last = 0, 0.0, 0.0, 0.0
    for pdf in pdfs:
        for v in pdf["value"].astype("float64"):
            n += 1
            d = v - mean
            mean += d / n
            m2 += d * (v - mean)
            last = v
    state.update((n, mean, m2, last))
    yield pd.DataFrame(
        {"key": [key[0]], "n": [n], "mean": [mean], "m2": [m2], "last": [last]}
    )


def running_stats(stream: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running (count, mean, M2, last) maintained across
    micro-batches.  Emits the current state per key per batch (update mode).
    """
    from pyspark.sql import functions as F

    keyed = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
