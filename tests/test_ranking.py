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


def test_global_prefix_sum_equals_single_window(spark):
    from pyspark.sql import Window

    from ideafast_etl_spark.operators.ranking import global_prefix_sum

    rows = [(i, ((i * 7) % 11) - 5) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long")
    order = [F.col("k").asc()]
    got = {
        r["k"]: r["prefix_sum"]
        for r in global_prefix_sum(df, order, "v").collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["k"]: r["ps"]
        for r in df.withColumn("ps", F.sum("v").over(w)).collect()
    }
    assert got == want

    # layout-invariant: a skewed repartition yields the identical series
    got2 = {
        r["k"]: r["prefix_sum"]
        for r in global_prefix_sum(df.repartition(13), order, "v").collect()
    }
    assert got2 == want


def test_sweep_line_concurrency_semantics(spark):
    """Half-open intervals: at an instant where one session ends and
    another starts, the −1 is applied first, so concurrency never
    double-counts the handover."""
    from ideafast_etl_spark.operators.ranking import global_prefix_sum

    # sessions: [1,4) [2,6) [4,5)  -> concurrency 1,2,2,2,1,0
    ivals = [(1, 1, 4), (2, 2, 6), (3, 4, 5)]
    b = spark.createDataFrame(
        [(s, 1, i) for i, s, _ in ivals] + [(e, -1, i) for i, _, e in ivals],
        "ts long, delta int, sid long",
    )
    p = global_prefix_sum(
        b,
        [F.col("ts").asc(), F.col("delta").asc(), F.col("sid").asc()],
        "delta",
        out_col="conc",
    )
    peak = p.agg(F.max("conc")).first()[0]
    assert peak == 2  # [4,5) starts exactly when [1,4) ends: no triple
    at4 = {
        (r["delta"], r["sid"]): r["conc"]
        for r in p.filter(F.col("ts") == 4).collect()
    }
    assert at4[(-1, 1)] == 1 and at4[(1, 3)] == 2
