"""Measure the recall cost of `cap_bucket_fanout` (r3 verdict #8).

Runs the three capped candidate generators (d3 MinHash-LSH, d4 SimHash,
d6 embedding hyperplane LSH) on the sf0.01 corpus twice — once with the
production cap (1000) and once effectively uncapped — and reports how many
final pairs the cap dropped.  The uncapped run is the recall denominator:
the cap can only remove pairs, never add them.

Usage: python tools/measure_cap_recall.py [sf_dir]
Prints one JSON line; paste the numbers into COVERAGE.md's recall note.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UNCAPPED = 10**9


def pair_set(df):
    return {(r[0], r[1]) for r in df.select("id_a", "id_b").collect()}


def main() -> None:
    from pyspark.sql import functions as F

    from ago_sisdb_spark.catalog import load_table
    from ago_sisdb_spark.operators import dedup, similarity
    from ago_sisdb_spark.operators import embed as embed_ops
    from ago_sisdb_spark.queries.pipeline import _d6_planes
    from ago_sisdb_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="cap_recall")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings")

    out = {"sf_dir": sf_dir, "cap": 1000}
    for name, fn in {
        "d3_minhash": lambda cap: dedup.minhash_lsh_candidates(
            docs, "doc_id", "text", max_bucket_size=cap
        ),
        "d4_simhash": lambda cap: dedup.simhash_neardup_pairs(
            docs, "doc_id", "text", max_bucket_size=cap
        ),
        "d6_embedding": lambda cap: similarity.cosine_neardup_lsh(
            emb, "vec_id", "embedding", threshold=0.40, dim=64,
            bits=6, tables=8, planes=_d6_planes(), max_bucket_size=cap
        ),
        # r12 (verdict #1): the symmetric bucketed bitext miner's
        # (band, key) occupancy cap — recall over MINED pairs, the
        # operator's deliverable
        "e12_bitext": lambda cap: embed_ops.bitext_margin_mine_bucketed(
            emb.where(F.col("vec_id") % 2 == 0),
            emb.where(F.col("vec_id") % 2 == 1),
            "vec_id", "embedding", k=4, bands=4, band_bits=8,
            max_bucket_size=cap,
        ).where(F.col("mined")).select(
            F.col("src_id").alias("id_a"), F.col("tgt_id").alias("id_b")
        ),
    }.items():
        capped = pair_set(fn(1000))
        full = pair_set(fn(UNCAPPED))
        missed = full - capped
        out[name] = {
            "pairs_capped": len(capped),
            "pairs_uncapped": len(full),
            "pairs_lost": len(missed),
            "recall": round(len(capped) / len(full), 6) if full else 1.0,
        }

    # Adversarial-skew row (r5 verdict #7): on the natural corpus the cap
    # never fires, so the recall=1.0 rows above don't show what the cap
    # COSTS when it bites.  Plant one degenerate boilerplate bucket
    # (3000 byte-identical docs — over the 1000 cap in every band) on top
    # of the real corpus and measure recall restricted to the
    # NON-degenerate pairs: the sacrifice must be confined to the
    # boilerplate bucket.
    n_boiler = 3000
    boiler_text = "lorem ipsum dolor sit amet the quick brown fox jumps over"
    boiler = spark.range(n_boiler).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.lit(boiler_text).alias("text"),
    )
    skewed = docs.unionByName(boiler)
    capped = pair_set(
        dedup.minhash_lsh_candidates(skewed, "doc_id", "text",
                                     max_bucket_size=1000)
    )
    full = pair_set(
        dedup.minhash_lsh_candidates(skewed, "doc_id", "text",
                                     max_bucket_size=UNCAPPED)
    )

    def non_degenerate(pairs):
        return {p for p in pairs if p[0] < 10_000_000 and p[1] < 10_000_000}

    nd_capped, nd_full = non_degenerate(capped), non_degenerate(full)
    out["d3_skew_planted"] = {
        "n_boilerplate_docs": n_boiler,
        "pairs_capped": len(capped),
        "pairs_uncapped": len(full),
        "boiler_pairs_dropped": len(full - capped),
        "nondegenerate_recall": (
            round(len(nd_capped) / len(nd_full), 6) if nd_full else 1.0
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
