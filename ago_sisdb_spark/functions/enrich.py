"""U4 — external-enrichment bridge (SURVEY §2.10).

The reference ships a python worker that calls an HTTP API per key and
merges the response into the frame (`pyscript/api_web.py:1-20`).  The
Spark-native form is an Arrow-batched ``mapInPandas`` stage with an
INJECTABLE fetch function: production wraps an HTTP client (connection
pool + retry + rate limit, one client per executor task, batched
requests); tests and offline runs inject a deterministic local stub.

Scale notes (100 TB): the fetch runs executor-side per Arrow batch, so
request fan-out parallelism == task parallelism — cap it by coalescing the
input to the number of concurrent requests the remote service tolerates.
Results never concentrate on the driver.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame

import pandas as pd  # noqa: E402  (published at module scope for pandas_udf)


def enrich(
    df: DataFrame,
    fetch_fn: Callable[["pd.DataFrame"], "pd.DataFrame"],
    result_schema: str,
) -> DataFrame:
    """Append enrichment columns computed by ``fetch_fn`` per Arrow batch.

    ``fetch_fn(batch: pd.DataFrame) -> pd.DataFrame`` receives the input
    columns and returns the SAME-length frame of enrichment columns; the
    output schema is ``input schema + result_schema`` (comma-separated DDL).
    A fetch error must be handled inside ``fetch_fn`` (return null cells),
    mirroring the null-safe media-stub contract: one bad key must not fail
    the job.
    """
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [result_schema]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            extra = fetch_fn(pdf)
            if len(extra) != len(pdf):
                # axis=1 concat would silently NaN-pad/misalign rows
                raise ValueError(
                    f"enrich fetch_fn returned {len(extra)} rows for a "
                    f"{len(pdf)}-row batch — it must be 1:1 with its input"
                )
            yield pd.concat(
                [pdf.reset_index(drop=True), extra.reset_index(drop=True)], axis=1
            )

    return df.mapInPandas(run, out_schema)


def stub_score_fetcher(key_col: str) -> Callable[["pd.DataFrame"], "pd.DataFrame"]:
    """Deterministic local stand-in for the HTTP scorer: Knuth-hash the key
    into [0,1) and tier it — pure arithmetic so the DuckDB oracle can
    replicate it exactly."""

    def fetch(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        k = pdf[key_col].to_numpy(dtype="int64")
        # mod BEFORE the multiply (int64-safe at any key magnitude — numpy
        # would wrap silently, the SQL oracle would not); raw double —
        # callers round in the plan so Spark and the DuckDB oracle round
        # the same value exactly once
        score = (((k % 1000003) * 2654435761) % 1000003) / 1000003.0
        tier = np.where(score >= 0.66, "hot", np.where(score >= 0.33, "warm", "cold"))
        return pd.DataFrame({"score": score, "tier": tier})

    return fetch
