"""StateStore.changes(): change-data-feed diff between retained snapshots."""

import pytest

from ideafast_etl_spark.state import StateStore


def _df(spark, rows):
    return spark.createDataFrame(rows, "hash string, x string")


def test_changes_classifies_insert_update_delete(spark, tmp_path):
    store = StateStore(spark, str(tmp_path / "s"), partition_by=(), keep_versions=5)
    store.init(_df(spark, [("a", "keep"), ("b", None), ("c", "gone")]))
    v0 = store.current_version()
    store.append_new(_df(spark, [("d", "new")]))
    store.merge_non_overwrite(_df(spark, [("b", "resolved")]), ("x",))
    store._quarantined_delete(_df(spark, [("c", "gone")]).select("hash"))

    out = {r["hash"]: r for r in store.changes(v0).collect()}
    assert set(out) == {"b", "c", "d"}  # 'a' unchanged -> absent
    assert out["d"]["change_type"] == "insert" and out["d"]["x"] == "new"
    assert out["b"]["change_type"] == "update" and out["b"]["x"] == "resolved"
    # delete carries the OLD row image
    assert out["c"]["change_type"] == "delete" and out["c"]["x"] == "gone"


def test_changes_between_two_historical_versions(spark, tmp_path):
    store = StateStore(spark, str(tmp_path / "s"), partition_by=(), keep_versions=5)
    store.init(_df(spark, [("a", None)]))
    v0 = store.current_version()
    store.merge_non_overwrite(_df(spark, [("a", "mid")]), ("x",))
    v1 = store.current_version()
    store.append_new(_df(spark, [("z", "late")]))
    # bounded window: only the v0 -> v1 update, not the later insert
    rows = store.changes(v0, v1).collect()
    assert [(r["change_type"], r["hash"], r["x"]) for r in rows] == [
        ("update", "a", "mid")
    ]


def test_changes_sees_schema_evolution_as_update(spark, tmp_path):
    store = StateStore(spark, str(tmp_path / "s"), partition_by=(), keep_versions=5)
    store.init(_df(spark, [("a", "v")]))
    v0 = store.current_version()
    wide = spark.createDataFrame(
        [("n", "w", "extra")], "hash string, x string, y string"
    )
    store.append_new(wide)
    out = {r["hash"]: r for r in store.changes(v0).collect()}
    # new row is an insert; old row's y reads NULL on both sides -> unchanged
    assert set(out) == {"n"}
    assert out["n"]["change_type"] == "insert" and out["n"]["y"] == "extra"


def test_changes_preimage_mode_matches_delta_cdf_shape(spark, tmp_path):
    store = StateStore(spark, str(tmp_path / "s"), partition_by=(), keep_versions=5)
    store.init(_df(spark, [("a", "old"), ("b", None)]))
    v0 = store.current_version()
    store.merge_non_overwrite(_df(spark, [("b", "now")]), ("x",))
    rows = sorted(
        (r["change_type"], r["hash"], r["x"])
        for r in store.changes(v0, include_preimage=True).collect()
    )
    assert rows == [("update_postimage", "b", "now"), ("update_preimage", "b", None)]


def test_incremental_view_maintenance_from_cdc(spark, tmp_path):
    """A downstream count-by-value aggregate maintained purely from the
    change feed must equal a full recompute."""
    from pyspark.sql import functions as F

    store = StateStore(spark, str(tmp_path / "s"), partition_by=(), keep_versions=9)
    store.init(
        _df(spark, [("a", "red"), ("b", "red"), ("c", "blue"), ("d", None)])
    )
    v0 = store.current_version()
    view = store.read(v0).groupBy("x").agg(F.count("*").alias("n"))

    store.append_new(_df(spark, [("e", "blue"), ("f", "green")]))
    store.merge_non_overwrite(_df(spark, [("d", "red")]), ("x",))
    store._quarantined_delete(_df(spark, [("b", "red")]).select("hash"))

    delta = store.changes(v0, include_preimage=True).withColumn(
        "w",
        F.when(F.col("change_type").isin("insert", "update_postimage"), 1).otherwise(-1),
    )
    maintained = (
        view.selectExpr("x", "CAST(n AS BIGINT) AS w")
        .unionByName(delta.select("x", "w"))
        .groupBy("x")
        .agg(F.sum("w").alias("n"))
        .filter(F.col("n") > 0)
    )
    recomputed = store.read().groupBy("x").agg(F.count("*").alias("n"))
    got = sorted((r["x"], r["n"]) for r in maintained.collect())
    want = sorted((r["x"], r["n"]) for r in recomputed.collect())
    assert got == want
