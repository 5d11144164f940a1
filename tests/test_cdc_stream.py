"""StateStore.stream_appends(): the append change log as a Structured-
Streaming source (Delta-style append-only table streaming; updates/merges go
through the batch ``changes()`` diff, not the stream)."""

import pytest

from ideafast_etl_spark.state import StateStore


def _df(spark, rows):
    return spark.createDataFrame(rows, "hash string, device_type string, x string")


def _drain(store, checkpoint, outdir):
    """availableNow drain into a parquet sink (fault-tolerant: supports
    restart from the same checkpoint, unlike the memory sink). Returns the
    ACCUMULATED sink rows — reprocessing a commit would show up as
    duplicate tuples here, so set-vs-count assertions catch it."""
    q = (
        store.stream_appends()
        .writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    rows = store.spark.read.parquet(outdir).collect()
    tuples = [
        (r["hash"], r["device_type"], r["x"], r["commit_version"]) for r in rows
    ]
    assert len(tuples) == len(set(tuples)), "a commit was processed twice"
    return set(tuples)


def test_stream_appends_emits_each_insert_delta_once(spark, tmp_path):
    store = StateStore(spark, str(tmp_path / "s"), keep_versions=2)
    store.append_new(_df(spark, [("a", "DRM", "1"), ("b", "VTP", "2")]))
    v1 = store.current_version()
    # second batch: one duplicate key (not an insert -> must NOT stream)
    store.append_new(_df(spark, [("b", "VTP", "dup"), ("c", "DRM", "3")]))
    v2 = store.current_version()
    # an update merge must not appear in the append stream at all
    store.merge_non_overwrite(
        spark.createDataFrame([("a", "filled")], "hash string, x string"),
        ("x",),
        partition_value="DRM",
    )

    rows = _drain(store, str(tmp_path / "ck1"), str(tmp_path / "out1"))
    assert rows == {
        ("a", "DRM", "1", v1),
        ("b", "VTP", "2", v1),
        ("c", "DRM", "3", v2),
    }


def test_stream_appends_resumes_from_checkpoint(spark, tmp_path):
    store = StateStore(spark, str(tmp_path / "s"), keep_versions=2)
    store.append_new(_df(spark, [("a", "DRM", "1")]))
    v1 = store.current_version()
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    first = _drain(store, ck, out)
    assert {r[0] for r in first} == {"a"}

    store.append_new(_df(spark, [("b", "VTP", "2")]))
    v2 = store.current_version()
    # same checkpoint: the restarted query must process ONLY the unseen
    # commit (the no-duplicates assert inside _drain proves it)
    second = _drain(store, ck, out)
    assert second == {("a", "DRM", "1", v1), ("b", "VTP", "2", v2)}


def test_stream_survives_snapshot_gc_and_truncation(spark, tmp_path):
    # keep_versions=1: the v1 snapshot is GC'd after later commits, but the
    # hardlinked change log keeps the delta bytes alive for the stream
    store = StateStore(spark, str(tmp_path / "s"), keep_versions=1)
    store.append_new(_df(spark, [("a", "DRM", "1")]))
    store.append_new(_df(spark, [("b", "DRM", "2")]))
    store.merge_non_overwrite(
        spark.createDataFrame([("a", "z")], "hash string, x string"), ("x",)
    )
    rows = _drain(store, str(tmp_path / "ck3"), str(tmp_path / "out3"))
    assert {r[0] for r in rows} == {"a", "b"}

    # retention: drop commits already consumed by every checkpointed reader
    assert store.truncate_cdc(before_version="99999999999999999999") == 2
    import os

    assert os.listdir(store.cdc_path()) == []


def test_log_appends_opt_out(spark, tmp_path):
    import os

    store = StateStore(spark, str(tmp_path / "s"), log_appends=False)
    store.append_new(_df(spark, [("a", "DRM", "1")]))
    assert not os.path.isdir(store.cdc_path())
