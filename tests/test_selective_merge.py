"""Partition-selective MERGE: only the affected partition is rewritten;
other partitions' files are hardlinked (same inode) into the new snapshot."""

import os

from pyspark.sql import functions as F

from ideafast_etl_spark.state import StateStore


def _inodes(snapshot_dir, partition):
    d = os.path.join(snapshot_dir, partition)
    return {
        fn: os.stat(os.path.join(d, fn)).st_ino
        for fn in os.listdir(d)
        if not fn.startswith(("_", "."))
    }


def test_selective_merge_rewrites_only_target_partition(spark, tmp_path):
    store = StateStore(spark, str(tmp_path / "s"))
    rows = [(f"h{i}", "DRM" if i % 2 == 0 else "BTF", None) for i in range(20)]
    store.init(
        spark.createDataFrame(rows, "hash string, device_type string, device_serial string")
    )
    v0 = store.current_version()
    btf_inodes_before = _inodes(store._snapshot_dir(v0), "device_type=BTF")

    updates = spark.createDataFrame(
        [("h0", "SER-0"), ("h2", "SER-2")], "hash string, device_serial string"
    )
    store.merge_non_overwrite(updates, ("device_serial",), partition_value="DRM")
    v1 = store.current_version()
    assert v1 != v0

    state = store.read()
    got = {r["hash"]: r["device_serial"] for r in state.collect()}
    assert got["h0"] == "SER-0" and got["h2"] == "SER-2"
    assert got["h1"] is None and got["h4"] is None
    assert state.count() == 20

    # untouched partition: identical inodes → hardlinked, not rewritten
    btf_inodes_after = _inodes(store._snapshot_dir(v1), "device_type=BTF")
    assert btf_inodes_after == btf_inodes_before


def test_selective_merge_non_overwrite_guard_still_holds(spark, tmp_path):
    store = StateStore(spark, str(tmp_path / "s"))
    store.init(
        spark.createDataFrame(
            [("h1", "DRM", "KEEP"), ("h2", "DRM", None)],
            "hash string, device_type string, device_serial string",
        )
    )
    poisoned = spark.createDataFrame(
        [("h1", "POISON"), ("h2", "FILL")], "hash string, device_serial string"
    )
    store.merge_non_overwrite(poisoned, ("device_serial",), partition_value="DRM")
    got = {r["hash"]: r["device_serial"] for r in store.read().collect()}
    assert got == {"h1": "KEEP", "h2": "FILL"}


def test_state_reads_prune_partitions(spark, tmp_path):
    """Worklist predicates on device_type must prune partition directories at
    the scan (PartitionFilters), not post-filter — at 100 TB that is the
    difference between reading one device's data and the whole table."""
    store = StateStore(spark, str(tmp_path / "s"))
    rows = [(f"h{i}", "DRM" if i % 2 == 0 else "BTF") for i in range(10)]
    store.init(spark.createDataFrame(rows, "hash string, device_type string"))
    scan = store.read().filter(F.col("device_type") == "DRM")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "device_type" in plan.split("PartitionFilters")[1][:120]
    assert scan.count() == 5


def test_selective_merge_falls_back_without_partition_value(spark, tmp_path):
    store = StateStore(spark, str(tmp_path / "s"), partition_by=())
    store.init(spark.createDataFrame([("h1", None)], "hash string, x string"))
    store.merge_non_overwrite(
        spark.createDataFrame([("h1", "v")], "hash string, x string"), ("x",)
    )
    assert store.read().first()["x"] == "v"
