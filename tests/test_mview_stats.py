"""Incremental MV maintenance (operators/mview.py) and ANALYZE stats
(operators/stats.py)."""

from pyspark.sql import functions as F

from ideafast_etl_spark.operators.mview import agg_state, cdc_state, merge_states
from ideafast_etl_spark.operators.stats import table_stats

KEYS = ["k"]


def SUMS():
    return {"s": F.col("v")}


def _rows(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def test_state_is_mergeable(spark):
    a = _rows(spark, [("x", 1), ("x", 2), ("y", 10)])
    b = _rows(spark, [("x", 4), ("z", 7)])
    direct = agg_state(a.unionByName(b), KEYS, SUMS())
    merged = merge_states(agg_state(a, KEYS, SUMS()), agg_state(b, KEYS, SUMS()), KEYS)
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, merged.collect()))


def test_cdc_maintenance_equals_recompute(spark):
    base = _rows(spark, [("x", 1), ("x", 2), ("y", 10), ("z", 5)])
    view = agg_state(base, KEYS, SUMS())
    # feed: insert (w,3); delete (y,10); update (x,2)->(x,20)
    changes = spark.createDataFrame(
        [
            ("insert", "w", 3),
            ("delete", "y", 10),
            ("update_preimage", "x", 2),
            ("update_postimage", "x", 20),
        ],
        "change_type string, k string, v long",
    )
    maintained = merge_states(view, cdc_state(changes, KEYS, SUMS()), KEYS)
    want = {("w", 1, 3), ("x", 2, 21), ("z", 1, 5)}  # y's group vanishes
    assert set(map(tuple, maintained.collect())) == want


def test_cdc_delete_all_drops_group(spark):
    view = agg_state(_rows(spark, [("x", 1)]), KEYS, SUMS())
    changes = spark.createDataFrame(
        [("delete", "x", 1)], "change_type string, k string, v long"
    )
    assert merge_states(view, cdc_state(changes, KEYS, SUMS()), KEYS).collect() == []


def test_table_stats_values(spark):
    df = spark.createDataFrame(
        [(1, 2.0, "a"), (2, None, "b"), (2, 8.0, None)],
        "id long, x double, s string",
    )
    out = {r["col_name"]: r.asDict() for r in table_stats(df).collect()}
    assert out["id"]["n"] == 3 and out["id"]["n_distinct"] == 2
    assert out["id"]["min_num"] == 1.0 and out["id"]["max_num"] == 2.0
    assert out["x"]["n_nulls"] == 1 and out["x"]["max_num"] == 8.0
    assert out["s"]["n_nulls"] == 1 and out["s"]["min_str"] == "a"
    assert out["s"]["min_num"] is None and out["id"]["min_str"] is None


def test_table_stats_approx_path(spark):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 37).alias("m")
    )
    out = {r["col_name"]: r for r in table_stats(df, exact=False).collect()}
    # HLL estimate lands near the true NDV on small exact-ish cardinalities
    assert abs(out["m"]["n_distinct"] - 37) <= 4
    assert out["id"]["n"] == 1000


def test_estimate_join_rows(spark):
    from ideafast_etl_spark.operators.stats import estimate_join_rows, table_stats

    fact = spark.range(1000).select((F.col("id") % 50).alias("k"))
    dim = spark.range(50).select(F.col("id").alias("k"))
    est = estimate_join_rows(table_stats(fact), "k", table_stats(dim), "k")
    true = fact.join(dim, "k").count()
    assert est == true == 1000  # uniform keys: the estimate is exact


def test_distribution_drift_detects_shift(spark):
    from ideafast_etl_spark.operators.stats import distribution_drift

    ref = spark.range(2000).select((F.col("id") % 100).cast("double").alias("v"))
    same = spark.range(2000).select((F.col("id") % 100).cast("double").alias("v"))
    shifted = spark.range(2000).select(
        ((F.col("id") % 100) * 0.2 + 80.0).alias("v")  # mass moves to [80,100)
    )
    def psi(cur):
        rows = distribution_drift(ref, cur, "v", 0.0, 100.0, n_bins=10).collect()
        assert len(rows) == 10
        return sum(r["psi_term"] for r in rows)
    assert abs(psi(same)) < 0.01          # identical -> stable
    assert psi(shifted) > 0.25            # planted shift -> flagged


def test_distribution_drift_rejects_bad_range(spark):
    import pytest

    from ideafast_etl_spark.operators.stats import distribution_drift

    df = spark.range(5).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError):
        distribution_drift(df, df, "v", 10.0, 10.0)  # hi == lo
    with pytest.raises(ValueError):
        distribution_drift(df, df, "v", 10.0, 0.0)  # inverted
    with pytest.raises(ValueError):
        distribution_drift(df, df, "v", 0.0, 10.0, n_bins=0)


def test_table_stats_hostile_column_names(spark):
    """Names with quotes, commas, dots, and spaces must survive — the
    unpivot is built from Column objects, never interpolated SQL."""
    hostile = ["a'b", "c,d", "e.f", "g h", "select"]
    df = spark.createDataFrame([(1, 2, 3, 4, 5), (9, 8, 7, 6, 5)], hostile)
    out = {r["col_name"]: r.asDict() for r in table_stats(df).collect()}
    assert sorted(out) == sorted(hostile)
    assert out["a'b"]["min_num"] == 1.0 and out["a'b"]["max_num"] == 9.0
    assert out["select"]["n_distinct"] == 1


def test_merge_states_accepts_reordered_columns(spark):
    a = _rows(spark, [("x", 1), ("y", 10)])
    b = _rows(spark, [("x", 4)])
    sa = agg_state(a, KEYS, SUMS())                       # (k, n, s)
    sb = agg_state(b, KEYS, SUMS()).select("k", "s", "n")  # reordered
    got = sorted(map(tuple, merge_states(sa, sb, KEYS).collect()))
    want = sorted(
        map(tuple, agg_state(a.unionByName(b), KEYS, SUMS()).collect())
    )
    assert got == want


def test_merge_states_rejects_non_numeric_state(spark):
    import pytest

    prev = spark.createDataFrame([("x", 1, "oops")], "k string, n long, s string")
    delta = spark.createDataFrame([("x", 1, "no")], "k string, n long, s string")
    with pytest.raises(ValueError, match="non-summable"):
        merge_states(prev, delta, KEYS)
