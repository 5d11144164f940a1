"""Snapshot retention / time travel (VERSION AS OF analog) and sql-over-views."""

import pytest

from pyspark.sql import functions as F

from ideafast_etl_spark.state import StateStore


def test_time_travel_reads_historical_snapshot(spark, tmp_path):
    store = StateStore(spark, str(tmp_path / "s"), partition_by=(), keep_versions=3)
    store.init(spark.createDataFrame([("h1", None)], "hash string, x string"))
    v0 = store.current_version()
    store.merge_non_overwrite(
        spark.createDataFrame([("h1", "resolved")], "hash string, x string"), ("x",)
    )
    v1 = store.current_version()
    assert v0 != v1 and store.versions() == sorted([v0, v1])
    # current sees the merge; the historical version still shows pre-merge
    assert store.read().first()["x"] == "resolved"
    assert store.read(version=v0).first()["x"] is None


def test_old_versions_gc_beyond_retention(spark, tmp_path):
    store = StateStore(spark, str(tmp_path / "s"), partition_by=(), keep_versions=2)
    store.init(spark.createDataFrame([("h1", None)], "hash string, x string"))
    versions = [store.current_version()]
    for i in range(3):
        # key must MATCH a state row: a merge that matches nothing is a
        # no-op and deliberately publishes no new version
        store.merge_non_overwrite(
            spark.createDataFrame([("h1", f"v{i}")], "hash string, x string"), ("x",)
        )
        versions.append(store.current_version())
    assert len(store.versions()) == 2
    with pytest.raises(FileNotFoundError, match="not retained"):
        store.read(version=versions[0])


def test_sql_over_registered_views(spark):
    from ideafast_etl_spark.tables import register_views

    register_views(spark, "/root/testdata/sf0.001")
    out = spark.sql(
        """
        SELECT n_name, COUNT(*) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_customers DESC LIMIT 3
        """
    ).collect()
    assert len(out) == 3 and all(r["n_customers"] > 0 for r in out)
