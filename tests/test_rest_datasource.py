"""Custom Python DataSource: partitioned executor-side REST scan."""

from pyspark.sql import functions as F

from ideafast_etl_spark.sources.rest_datasource import RestDataSource


def test_partitioned_rest_scan_reads_all_rows(spark):
    spark.dataSource.register(RestDataSource)
    df = (
        spark.read.format("paginated_rest")
        .option("total_records", 100)
        .option("page_size", 30)
        .option("num_partitions", 4)
        .load()
    )
    assert df.count() == 100
    # rows are unique and complete despite partition-parallel fetch
    assert df.select("id").distinct().count() == 100
    assert df.rdd.getNumPartitions() > 1
    # late-data rows (every 5th) carry NULL data_url (F9 gate applies)
    assert df.filter(F.col("data_url").isNull()).count() == 20


def test_rest_scan_composes_with_shaping(spark):
    from ideafast_etl_spark.operators.projections import shape_api_rows

    spark.dataSource.register(RestDataSource)
    flat = (
        spark.read.format("paginated_rest")
        .option("total_records", 40)
        .load()
    )
    nested = flat.select(
        "id", "device",
        F.struct(F.col("start_time"), F.col("stop_time")).alias("report"),
        "data_url",
    )
    shaped = shape_api_rows(nested, "DRM")
    rows = shaped.collect()
    assert len(rows) == 40
    assert all(len(r["hash"]) == 64 for r in rows)
    assert all(r["meta"]["dreem_uid"].startswith("uid-") for r in rows)
