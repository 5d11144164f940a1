"""Scale-safe global rank (operators/ranking.py): equivalence with the
single-partition window, determinism, bucket-rule edges."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ideafast_etl_spark.operators.ranking import global_rank, rank_buckets


def _data(spark, n=500):
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") * 37 % 83).alias("score"),  # heavy ties
    )


def test_global_rank_equals_single_window(spark):
    df = _data(spark)
    order = [F.asc("score"), F.asc("id")]
    got = {
        r["id"]: r["rank"]
        for r in global_rank(df, order, num_partitions=8).collect()
    }
    w = Window.orderBy(*order)
    want = {
        r["id"]: r["rank"]
        for r in df.withColumn(
            "rank", F.row_number().over(w).cast("long")
        ).collect()
    }
    assert got == want


def test_global_rank_deterministic_across_layouts(spark):
    df = _data(spark, 300)
    order = [F.asc("score"), F.asc("id")]
    a = sorted(map(tuple, global_rank(df, order, num_partitions=4).collect()))
    b = sorted(
        map(
            tuple,
            global_rank(
                df.repartition(13), order, num_partitions=9
            ).collect(),
        )
    )
    assert a == b


def test_rank_buckets_rule_and_labels(spark):
    df = spark.createDataFrame(
        [(i + 1,) for i in range(10)], ["rank"]
    )
    out = {
        r["rank"]: r["bucket"]
        for r in rank_buckets(df, 10, 3, labels=["h", "m", "t"]).collect()
    }
    # bucket = (3*(rank-1)) div 10 -> ranks 1-4 h, 5-7 m, 8-10 t
    assert out == {1: "h", 2: "h", 3: "h", 4: "h", 5: "m", 6: "m", 7: "m",
                   8: "t", 9: "t", 10: "t"}


def test_rank_buckets_label_arity_checked(spark):
    df = spark.createDataFrame([(1,)], ["rank"])
    with pytest.raises(ValueError):
        rank_buckets(df, 1, 3, labels=["only-two", "labels"])


def test_bounded_topk_equals_direct_window(spark):
    from ideafast_etl_spark.operators.ranking import bounded_topk_per_group

    df = spark.range(400).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") * 31 % 97).alias("score"),
        F.col("id"),
    )
    order = [F.asc("score"), F.asc("id")]
    got = sorted(
        map(
            tuple,
            bounded_topk_per_group(
                df.repartition(7), ["g"], order, 5
            ).collect(),
        )
    )
    w = Window.partitionBy("g").orderBy(*order)
    want = sorted(
        map(
            tuple,
            df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .collect(),
        )
    )
    assert got == want
