"""Salted skew operators (result parity with naive plans) and streaming
windowed aggregation (batch-equivalence of the cut-off semantics)."""

from datetime import datetime

from pyspark.sql import functions as F

from ideafast_etl_spark.operators.skew import salted_count, salted_skew_join, salted_sum


def _skewed_df(spark):
    # one hot key (90%) + long tail
    rows = [("hot", float(i % 7)) for i in range(900)] + [
        (f"k{i}", float(i)) for i in range(100)
    ]
    return spark.createDataFrame(rows, "k string, v double")


def test_salted_count_matches_naive(spark):
    df = _skewed_df(spark)
    naive = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    salted = {r["k"]: r["count"] for r in salted_count(df, ["k"]).collect()}
    assert salted == naive


def test_salted_sum_matches_naive(spark):
    df = _skewed_df(spark).withColumn("v", F.col("v").cast("long"))
    naive = {r["k"]: r["sum(v)"] for r in df.groupBy("k").agg(F.sum("v")).collect()}
    salted = {r["k"]: r["sum_v"] for r in salted_sum(df, ["k"], "v").collect()}
    assert salted == naive


def test_salted_skew_join_matches_naive(spark):
    facts = _skewed_df(spark)
    dim = spark.createDataFrame(
        [("hot", "HOT-DIM"), ("k5", "K5-DIM")], "k string, label string"
    )
    naive = facts.join(dim, "k").groupBy("k", "label").count()
    salted = salted_skew_join(facts, dim, "k").groupBy("k", "label").count()
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, salted.collect()))


def test_streaming_window_matches_batch_bucketing(spark, tmp_path):
    """The streaming tumbling window with cut-off startTime assigns records to
    the same day-buckets as the batch G1 operator."""
    from ideafast_etl_spark.operators.grouping import assign_group_id
    from ideafast_etl_spark.streaming.windows import windowed_group_counts

    rows = [
        ("NR1", "A", datetime(2021, 12, 13, 11, 59, 59)),  # before noon cut-off
        ("NR1", "A", datetime(2021, 12, 13, 12, 0, 0)),    # at cut-off
        ("NR1", "A", datetime(2021, 12, 13, 12, 0, 1)),
        ("NR2", "B", datetime(2021, 12, 14, 3, 0, 0)),
    ]
    schema = "device_id string, patient_id string, start timestamp"
    src = tmp_path / "src"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src / "b1"))

    stream = spark.readStream.schema(schema).parquet(str(src) + "/*/")
    q = (
        windowed_group_counts(stream, cut_off="12:00:00")
        .writeStream.format("memory")
        .queryName("win_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["device_id"], r["patient_id"], r["window_start"]): r["n_records"]
        for r in spark.sql("select * from win_out").collect()
    }
    # batch G1 for comparison: bucket_start is the window's day (midnight);
    # streaming window_start is that day at the cut-off (12:00)
    batch = assign_group_id(
        spark.createDataFrame(rows, schema), cut_off="12:00:00", ts_col="start"
    ).collect()
    batch_counts: dict = {}
    for r in batch:
        key = (r["device_id"], r["patient_id"], r["bucket_start"].replace(hour=12))
        batch_counts[key] = batch_counts.get(key, 0) + 1
    assert got == batch_counts
    # the 11:59:59 record landed in the PREVIOUS day's window
    assert got[("NR1", "A", datetime(2021, 12, 12, 12, 0, 0))] == 1
    assert got[("NR1", "A", datetime(2021, 12, 13, 12, 0, 0))] == 2
