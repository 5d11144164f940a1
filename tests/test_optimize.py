"""optimize_table maintenance op (operators/layout.py): compaction, atomic
swap, data preservation, Z-order variant, small-table no-op."""

import glob

from pyspark.sql import functions as F

from ideafast_etl_spark.operators.layout import optimize_table


def test_compaction_preserves_data(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(10_000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    ).repartition(40).write.parquet(p)
    before = sorted(
        map(tuple, spark.read.parquet(p).orderBy("id").collect())
    )
    stats = optimize_table(spark, p, target_file_mb=128)
    assert stats["skipped"] is False
    assert stats["files_before"] == 40
    assert stats["files_after"] < 40
    after = sorted(map(tuple, spark.read.parquet(p).orderBy("id").collect()))
    assert after == before
    # no leftover temp/old dirs
    assert not glob.glob(str(tmp_path / "t.__*"))


def test_small_table_noop(spark, tmp_path):
    p = str(tmp_path / "small")
    spark.range(10).coalesce(2).write.parquet(p)
    stats = optimize_table(spark, p)
    assert stats["skipped"] is True and stats["files_after"] == stats["files_before"]


def test_zorder_variant_clusters(spark, tmp_path):
    p = str(tmp_path / "z")
    df = spark.range(20_000).select(
        (F.col("id") % 100).cast("double").alias("x"),
        ((F.col("id") * 37) % 100).cast("double").alias("y"),
    )
    df.repartition(30).write.parquet(p)
    stats = optimize_table(
        spark, p, target_file_mb=1, zorder=("x", "y", (0.0, 100.0), (0.0, 100.0))
    )
    assert stats["skipped"] is False
    got = spark.read.parquet(p)
    assert got.count() == 20_000
    # clustered layout: a selective x-filter reads fine and results match
    assert got.filter(F.col("x") < 10).count() == df.filter(F.col("x") < 10).count()


def test_interrupted_swap_rolls_back(spark, tmp_path):
    """A crash between the two swap renames leaves data in .__old__ and no
    table dir; the next call must roll back and then compact normally."""
    import os

    p = str(tmp_path / "crash")
    spark.range(5_000).repartition(20).write.parquet(p)
    before = sorted(map(tuple, spark.read.parquet(p).collect()))
    os.rename(p, p + ".__old__")  # simulate crash after rename #1
    stats = optimize_table(spark, p, target_file_mb=128)
    assert stats["skipped"] is False and stats["files_before"] == 20
    assert sorted(map(tuple, spark.read.parquet(p).collect())) == before
    assert not glob.glob(str(tmp_path / "crash.__*"))
