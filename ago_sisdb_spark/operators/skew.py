"""Skew mitigation: salted aggregation and salted broadcast-replicated join.

The reference is single-process and never shuffles, so skew is its client's
problem (`SURVEY §4` shuffle row).  At 100 TB with hot keys (one symbol =
half the ticks, one user = half the events) a plain groupBy/join sends a
whole hot key to one reducer.  Two standard remedies, kept explicit because
AQE's skew-join splitting only covers sort-merge *joins*, not aggregations:

- ``salted_agg``: two-stage aggregation — partial agg on (key, salt), final
  agg on key.  Works for algebraic aggregates (sum/count/min/max and any
  combination that composes from them, e.g. avg = sum/count).
- ``salted_broadcast_join``: big side salted, small side exploded ×N — every
  salt bucket still finds its match; the hot key's rows spread over N tasks.

Both are deterministic: salt = pmod(hash(entire row id expr), n).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),  # final combine of partial counts is a sum
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_expr: Column | None = None,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs``: output name → (op, input col), op in sum/count/min/max.
    avg is intentionally absent — express it as sum+count and divide after.

    The first stage shuffles on (keys, salt) so a hot key spreads across
    ``n_salts`` reducers; the second shuffles only the already-tiny partial
    rows.  (Spark's own partial aggregation solves this *within* a map task;
    salting solves it across the reduce side.)
    """
    for name, (op, _col) in aggs.items():
        if op not in _ALGEBRAIC:
            raise ValueError(f"{name}: {op!r} is not algebraic; use sum/count/min/max")
    salt = (
        salt_expr
        if salt_expr is not None
        else F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *[
            _ALGEBRAIC[op][0](c).alias(f"__p_{name}")
            for name, (op, c) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[op][1](f"__p_{name}").alias(name)
            for name, (op, _c) in aggs.items()
        ]
    )


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, explode the small side ×N.

    For genuinely broadcast-able small sides prefer ``broadcast(small)`` —
    Spark already avoids the shuffle entirely.  This form is for the middle
    ground: small side too big to broadcast whole, big side skewed on the
    join key; the salt bounds any single reducer's share of a hot key to
    1/n_salts.  (For SMJ skew under AQE, spark.sql.adaptive.skewJoin
    handles splitting automatically — see session.py defaults.)
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = b.join(s, [*on, "__salt"], how)
    return out.drop("__salt")
