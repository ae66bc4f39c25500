"""Series-query edge cases (array-form rewrites, r7)."""

from __future__ import annotations

from pyspark.sql import functions as F




def test_directional_corr_empty_and_single_day_series(spark, tmp_path):
    """slice() raises on a negative length, so an events table with zero
    (or one) days must yield the zero-pair row, not a runtime error —
    the old lag-window form returned NULL corr there (review-caught)."""
    from ago_sisdb_spark.inventory import extended_queries

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    fn = extended_queries()["a6_directional_corr"]

    src.limit(0).write.parquet(str(tmp_path / "empty" / "events.parquet"))
    row = fn(spark, str(tmp_path / "empty")).collect()[0]
    assert (row.dir_corr, row.n_same_dir, row.n_days) == (None, 0, 0)

    one_day = src.where(F.to_date("ts") == src.select(
        F.min(F.to_date("ts"))).collect()[0][0])
    one_day.write.parquet(str(tmp_path / "one" / "events.parquet"))
    row = fn(spark, str(tmp_path / "one")).collect()[0]
    assert (row.dir_corr, row.n_same_dir, row.n_days) == (None, 0, 0)


def test_mannwhitney_matches_independent_python(spark):
    """u1_x2 equals twice the textbook pairwise U; z matches the
    tie-corrected normal approximation computed independently."""
    import math
    import random

    from ago_sisdb_spark.operators import series as series_ops

    rng = random.Random(11)
    rows = [("A", float(rng.randint(0, 8))) for _ in range(40)] + [
        ("B", float(rng.randint(2, 10))) for _ in range(35)
    ]
    df = spark.createDataFrame(rows, "grp string, value double")
    r = series_ops.mannwhitney_u(df, "value", "grp", "A", "B").collect()[0]

    a = [v for g, v in rows if g == "A"]
    b = [v for g, v in rows if g == "B"]
    u1_x2 = sum(2 if x > y else (1 if x == y else 0) for x in a for y in b)
    assert (r["n_a"], r["n_b"], r["u1_x2"]) == (len(a), len(b), u1_x2)

    from collections import Counter

    t = Counter(a + b)
    T = sum(c**3 - c for c in t.values())
    assert r["tie_term"] == T
    n1, n2 = len(a), len(b)
    n = n1 + n2
    sd = math.sqrt(n1 * n2 / 12 * ((n + 1) - T / (n * (n - 1))))
    z = (u1_x2 / 2 - n1 * n2 / 2) / sd
    assert abs(r["z"] - z) < 1e-12


def test_mannwhitney_hand_case_no_ties(spark):
    """A=[1,2], B=[3,4]: U1=0, no ties, z = -2/sqrt(5/3)."""
    import math

    from ago_sisdb_spark.operators import series as series_ops

    df = spark.createDataFrame(
        [("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0)], "grp string, value double"
    )
    r = series_ops.mannwhitney_u(df, "value", "grp", "A", "B").collect()[0]
    assert (r["u1_x2"], r["tie_term"]) == (0, 0)
    assert abs(r["z"] - (-2.0 / math.sqrt(5.0 / 3.0))) < 1e-12
