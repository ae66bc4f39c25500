"""Corpus data-card report: the per-slice summary a training-data release
ships with (docs/tokens/length distribution per language and per source).

One scan + ONE shuffle: the lang/source/overall slices are grouping sets
over the same aggregate, not three scans unioned — the same trick the
multidimensional agg entry (`agg_multidim`) uses, applied to corpus
reporting.  At 100 TB the exact medians/percentiles become
``approx_percentile`` (documented swap, same as a3_mean_median).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["corpus_datacard"]


def corpus_datacard(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Summary rows per (dim, grp): overall ('all','all'), per-language
    ('lang', <lang>), and per-source ('source', <source>).

    Columns: n_docs, n_tokens, avg_tokens, median_chars, p90_chars.
    """
    base = docs.select(
        "lang",
        "source",
        F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("__toks"),
        F.length(text_col).alias("__chars"),
    )
    g = base.groupingSets([["lang"], ["source"], []], "lang", "source")
    # grouping() flags distinguish a grouped-out column from a genuinely
    # NULL data value; they are only valid inside the agg projection
    dim = (
        F.when(F.grouping("lang") == 0, F.lit("lang"))
        .when(F.grouping("source") == 0, F.lit("source"))
        .otherwise(F.lit("all"))
    )
    grp = (
        F.when(F.grouping("lang") == 0, F.col("lang"))
        .when(F.grouping("source") == 0, F.col("source"))
        .otherwise(F.lit("all"))
    )
    return g.agg(
        dim.alias("dim"),
        grp.alias("grp"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__toks").alias("n_tokens"),
        F.round(F.avg("__toks"), 6).alias("avg_tokens"),
        F.round(F.median("__chars"), 6).alias("median_chars"),
        F.round(F.percentile("__chars", 0.9), 6).alias("p90_chars"),
    ).select(
        "dim", "grp", "n_docs", "n_tokens", "avg_tokens", "median_chars",
        "p90_chars",
    )
