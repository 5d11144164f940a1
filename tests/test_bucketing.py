"""Bucketed co-located joins (operators/bucketing.py): the join plan over
two co-bucketed tables must contain no shuffle Exchange."""

import io
from contextlib import redirect_stdout

import pytest

from ideafast_etl_spark.operators.bucketing import colocated_join, write_bucketed
from ideafast_etl_spark.tables import load


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


@pytest.fixture
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_cobucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    cust = load(spark, "customer", "/root/testdata/sf0.001")
    orders = load(spark, "orders", "/root/testdata/sf0.001")
    try:
        write_bucketed(cust, "b_cust", "c_custkey", 4, path=str(tmp_path / "c"))
        write_bucketed(orders, "b_ord", "o_custkey", 4, path=str(tmp_path / "o"))
        joined = colocated_join(spark, "b_cust", "b_ord", "c_custkey", "o_custkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket i joins bucket i — no shuffle
        # and the result is the plain join's result
        expected = cust.join(
            orders, cust["c_custkey"] == orders["o_custkey"]
        ).count()
        assert joined.count() == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS b_cust")
        spark.sql("DROP TABLE IF EXISTS b_ord")


def test_bucketed_aggregation_skips_shuffle(spark, tmp_path, no_broadcast):
    orders = load(spark, "orders", "/root/testdata/sf0.001")
    try:
        write_bucketed(orders, "b_ord2", "o_custkey", 4, path=str(tmp_path / "o2"))
        agg = spark.table("b_ord2").groupBy("o_custkey").count()
        plan = _plan(agg)
        # grouping on the bucket key: partial+final agg collapse, no exchange
        assert "Exchange" not in plan
        assert agg.count() == orders.select("o_custkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_ord2")
