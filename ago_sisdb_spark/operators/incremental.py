"""Bloom-filter incremental dedup: screen a new batch against a historical
corpus WITHOUT joining the corpus.

The 100 TB ingest problem: each new batch must be deduped against
everything already ingested.  Joining batch × history shuffles history
every time; the standard fix is a compact membership summary.  A Bloom
filter over historical content digests is ~1.2 GB per 10¹⁰ documents at
1% FP (k=5, ~10 bits/doc) — broadcastable — and Bloom "no" is exact, so
only the tiny "possibly seen" slice ever touches the expensive verify
join (two-tier screen).  Reference parity: the reference dedups only
within its own write path (`sisdb_fmap_ctrl.c` same-key upserts);
cross-corpus screening is part of the beyond-reference LLM-pipeline
surface (SURVEY §2.11).

Spark shapes — everything is DataFrame-native and engine-portable:

- the filter itself is a DATAFRAME of (word, mask) rows — 32-bit words
  packed in longs, built by groupBy(word) + bit_or aggregate.  The bitmap
  partial-aggregates map-side, so building it shuffles at most
  n_bits/32 rows regardless of corpus size, and the result broadcasts;
- bit positions derive from ``portable_hash60(digest || '#' || i)`` —
  the same md5-based portable hash as the MinHash/SimHash oracle twins,
  so the ENTIRE structure (set bits, probe hits, verdicts) is
  reproducible in DuckDB SQL and hash-checked by the gate;
- membership probing is an explode (k rows per doc) + broadcast join on
  word + per-doc min(bit_set) — a Bloom miss on ANY of the k positions
  proves the doc unseen (no false negatives, by construction);
- ``verify=True`` adds the second tier: ONLY docs flagged possible_dup
  join the historical digest set for the exact verdict.

Spark's built-in ``DataFrame.stat`` Bloom support stays JVM-side and
non-portable; this form trades a few percent of build speed for an
oracle-checkable, engine-agnostic artifact you can persist as parquet.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ago_sisdb_spark.operators.dedup import (
    PORTABLE_HASH_SQL,
    content_digest,
    portable_hash60,
)


def bloom_positions(digest: Column, n_bits: int, n_hashes: int) -> Column:
    """k portable bit positions per digest (array<long>)."""
    return F.array(
        *[
            portable_hash60(F.concat(digest, F.lit(f"#{i}"))) % F.lit(n_bits)
            for i in range(n_hashes)
        ]
    )


def build_bloom(
    history: DataFrame,
    text_col: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 5,
) -> DataFrame:
    """Sparse Bloom bitmap over content digests: (word, mask) rows.

    32-bit words (word = pos >> 5, mask bits = pos & 31) keep every shift
    inside non-negative int64 territory in both Spark and the SQL oracle.
    Row count ≤ n_bits/32; persist as parquet to reuse across batches.
    """
    pos = history.select(
        F.explode(
            bloom_positions(content_digest(F.col(text_col)), n_bits, n_hashes)
        ).alias("pos")
    )
    # shiftleft/shiftright take a Column bit count only via SQL form
    return (
        pos.groupBy(F.shiftright("pos", 5).alias("word"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(cast(1 as bigint), cast(pos % 32 as int))")
            ).alias("mask")
        )
    )


def screen_batch(
    batch: DataFrame,
    bloom: DataFrame,
    id_col: str,
    text_col: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 5,
    history: DataFrame | None = None,
) -> DataFrame:
    """Two-tier incremental dedup verdicts for a new batch.

    Returns (id, status, is_dup):

    - status 'definitely_new' — some probed bit unset; EXACT (a Bloom
      filter has no false negatives), is_dup = false with no join;
    - status 'possible_dup' — all k bits set; if ``history`` is given,
      ONLY these docs join the historical digests for the exact is_dup
      verdict (the second tier); otherwise is_dup is null.
    """
    probes = batch.select(
        F.col(id_col).alias("id"),
        content_digest(F.col(text_col)).alias("digest"),
    ).select(
        "id",
        "digest",
        F.explode(bloom_positions(F.col("digest"), n_bits, n_hashes)).alias("pos"),
    )
    hit = F.when(
        F.col("mask").isNotNull()
        & (
            F.expr("shiftright(mask, cast(pos % 32 as int)) & 1") == 1
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    verdicts = (
        probes.withColumn("word", F.shiftright("pos", 5))
        .join(F.broadcast(bloom), "word", "left")
        .select("id", "digest", hit.alias("hit"))
        .groupBy("id", "digest")
        .agg(F.min("hit").alias("__all_set"))
        .select(
            "id",
            "digest",
            F.when(F.col("__all_set") == 1, F.lit("possible_dup"))
            .otherwise(F.lit("definitely_new"))
            .alias("status"),
        )
    )
    if history is None:
        return verdicts.select(
            "id", "status", F.lit(None).cast("boolean").alias("is_dup")
        )
    hist_digests = history.select(
        content_digest(F.col(text_col)).alias("digest")
    ).distinct()
    maybe = verdicts.where(F.col("status") == "possible_dup")
    verified = maybe.join(hist_digests, "digest", "left_semi").select(
        "id", F.lit(True).alias("is_dup")
    )
    return (
        verdicts.join(F.broadcast(verified), "id", "left")
        .select(
            "id",
            "status",
            F.when(F.col("status") == "definitely_new", F.lit(False))
            .otherwise(F.coalesce("is_dup", F.lit(False)))
            .alias("is_dup"),
        )
    )


def bloom_screen_oracle_sql(
    hist_sql: str,
    batch_sql: str,
    id_col: str,
    text_col: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 5,
) -> str:
    """DuckDB SQL reproducing build_bloom + screen_batch(verify) exactly —
    same md5 digests, same portable positions, same 32-bit packing, same
    two-tier verdicts.  ``hist_sql`` / ``batch_sql`` are subqueries
    yielding the historical and new rows."""
    def pos_expr(i: int) -> str:
        h = PORTABLE_HASH_SQL.format(col=f"digest || '#{i}'")
        return f"({h}) % {n_bits}"

    hist_pos = "\n        UNION ALL ".join(
        f"SELECT {pos_expr(i)} AS pos FROM hist" for i in range(n_hashes)
    )
    batch_pos = "\n        UNION ALL ".join(
        f"SELECT id, digest, {pos_expr(i)} AS pos FROM batch"
        for i in range(n_hashes)
    )
    return f"""
    WITH hist AS (
        SELECT md5({text_col}) AS digest FROM ({hist_sql})),
    hpos AS (
        {hist_pos}),
    bloom AS (
        SELECT pos >> 5 AS word,
               bit_or(CAST(1 AS BIGINT) << CAST(pos & 31 AS INT)) AS mask
        FROM hpos GROUP BY 1),
    batch AS (
        SELECT {id_col} AS id, md5({text_col}) AS digest FROM ({batch_sql})),
    bpos AS (
        {batch_pos}),
    probed AS (
        SELECT p.id, p.digest,
               CASE WHEN b.mask IS NOT NULL
                         AND ((b.mask >> CAST(p.pos & 31 AS INT)) & 1) = 1
                    THEN 1 ELSE 0 END AS hit
        FROM bpos p LEFT JOIN bloom b ON (p.pos >> 5) = b.word),
    verdicts AS (
        SELECT id, digest,
               CASE WHEN min(hit) = 1 THEN 'possible_dup'
                    ELSE 'definitely_new' END AS status
        FROM probed GROUP BY id, digest)
    SELECT id, status,
           CASE WHEN status = 'definitely_new' THEN false
                ELSE digest IN (SELECT digest FROM hist) END AS is_dup
    FROM verdicts
    """
