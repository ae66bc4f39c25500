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
