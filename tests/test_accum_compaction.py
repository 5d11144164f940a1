"""Compaction + checkpoint-reset guard for the batch-id-keyed streaming
accumulations (streaming/accum.py — r8 verdict #4 and the jsonl_ingest
ADVICE item): folding committed batch directories must never change what
a reader sees, a replayed batch must stay idempotent after compaction,
and a fresh checkpoint over an existing accumulation must refuse to
start instead of silently renumbering batches over it."""

import os

import pytest
from pyspark.sql import functions as F

from ideafast_etl_spark.sources.jsonl import parse_jsonl_lines, read_jsonl
from ideafast_etl_spark.streaming.accum import (
    _batch_dirs,
    compact_accumulation,
    guard_fresh_checkpoint,
    live_paths,
    read_accumulation,
)
from ideafast_etl_spark.streaming.jsonl_ingest import (
    read_ingested,
    run_jsonl_ingest_stream,
)

SCHEMA = "doc_id long, text string"


def _setup(tmp_path):
    for d in ("src", "corpus", "quar"):
        (tmp_path / d).mkdir()
    return (
        str(tmp_path / "src"),
        str(tmp_path / "corpus"),
        str(tmp_path / "quar"),
        str(tmp_path / "ckpt"),
    )


def _drain(spark, src, corpus, quar, ckpt, **kw):
    q = run_jsonl_ingest_stream(spark, src, SCHEMA, corpus, quar, ckpt, **kw)
    q.awaitTermination()


def _shard(tmp_path, name, ids):
    (tmp_path / "src" / name).write_text(
        "".join(f'{{"doc_id": {i}, "text": "t{i}"}}\n' for i in ids)
        + "BROKEN\n"
    )


def test_compaction_read_equivalence(spark, tmp_path):
    """Three drains with auto-compaction: the accumulated corpus and
    quarantine stay row-identical to the batch reader on the shard
    union, while the batch directories fold into one snapshot."""
    src, corpus, quar, ckpt = _setup(tmp_path)
    _shard(tmp_path, "w1.jsonl", [1, 2])
    _drain(spark, src, corpus, quar, ckpt, compact_after_batches=2)
    _shard(tmp_path, "w2.jsonl", [3])
    _drain(spark, src, corpus, quar, ckpt, compact_after_batches=2)
    _shard(tmp_path, "w3.jsonl", [4, 5])
    _drain(spark, src, corpus, quar, ckpt, compact_after_batches=2)

    got = sorted(
        map(tuple, read_ingested(spark, corpus).select("doc_id", "text").collect())
    )
    good_b, quar_b = read_jsonl(spark, f"{src}/*.jsonl", SCHEMA)
    assert got == sorted(map(tuple, good_b.select("doc_id", "text").collect()))
    assert read_ingested(spark, quar).count() == quar_b.count() == 3
    # directories actually folded: at most the post-compaction tail remains
    assert os.path.isdir(f"{corpus}/compact-1")
    assert set(_batch_dirs(corpus)) == {2}


def test_post_compaction_replay_is_idempotent(spark, tmp_path):
    """A batch replayed after compaction (crash between its write and the
    checkpoint commit) overwrites its own directory and nothing else —
    the replayable batch is by definition uncommitted, so it was never
    folded."""
    src, corpus, quar, ckpt = _setup(tmp_path)
    _shard(tmp_path, "w1.jsonl", [1])
    _drain(spark, src, corpus, quar, ckpt)
    _shard(tmp_path, "w2.jsonl", [2])
    _drain(spark, src, corpus, quar, ckpt)
    folded = compact_accumulation(spark, corpus, ckpt)
    assert folded == 2

    # crash mid-batch-2: the cycle body ran (batch-2 written) but the
    # commit never landed
    (tmp_path / "src" / "w3.jsonl").write_text('{"doc_id": 3, "text": "x"}\n')
    lines = spark.read.text(f"{src}/w3.jsonl")
    good, _bad = parse_jsonl_lines(lines, SCHEMA)
    good.write.mode("overwrite").parquet(f"{corpus}/batch-2")

    # restart: structured streaming replays batch 2 over the same shard
    _drain(spark, src, corpus, quar, ckpt)
    got = sorted(r.doc_id for r in read_ingested(spark, corpus).collect())
    assert got == [1, 2, 3]

    # and compacting again folds the replayed batch cleanly
    compact_accumulation(spark, corpus, ckpt)
    got = sorted(r.doc_id for r in read_ingested(spark, corpus).collect())
    assert got == [1, 2, 3]
    assert not _batch_dirs(corpus)


def test_fresh_checkpoint_over_existing_data_refuses(spark, tmp_path):
    src, corpus, quar, ckpt = _setup(tmp_path)
    _shard(tmp_path, "w1.jsonl", [1])
    _drain(spark, src, corpus, quar, ckpt)
    import shutil

    shutil.rmtree(ckpt)
    with pytest.raises(ValueError, match="checkpoint"):
        run_jsonl_ingest_stream(spark, src, SCHEMA, corpus, quar, ckpt)
    # a genuinely fresh pairing still starts
    guard_fresh_checkpoint(str(tmp_path / "newckpt"), str(tmp_path / "newdir"))


def test_crash_window_read_stays_exact_and_repairs(spark, tmp_path):
    """Crash between the compact rename and the source removals leaves a
    folded batch directory on disk: read_accumulation must not double-
    count it, and the next compaction removes the remnant."""
    src, corpus, quar, ckpt = _setup(tmp_path)
    _shard(tmp_path, "w1.jsonl", [1])
    _drain(spark, src, corpus, quar, ckpt)
    _shard(tmp_path, "w2.jsonl", [2])
    _drain(spark, src, corpus, quar, ckpt)
    # snapshot batch-1, compact, then resurrect it = the crash remnant
    import shutil

    shutil.copytree(f"{corpus}/batch-1", str(tmp_path / "saved-batch-1"))
    assert compact_accumulation(spark, corpus, ckpt) == 2
    shutil.copytree(str(tmp_path / "saved-batch-1"), f"{corpus}/batch-1")

    assert {os.path.basename(p) for p in live_paths(corpus)} == {"compact-1"}
    got = sorted(r.doc_id for r in read_accumulation(spark, corpus).collect())
    assert got == [1, 2]  # no double count
    compact_accumulation(spark, corpus, ckpt)  # repair pass
    assert not _batch_dirs(corpus)
    got = sorted(r.doc_id for r in read_accumulation(spark, corpus).collect())
    assert got == [1, 2]


def test_detector_stream_with_compaction_keeps_batch_parity(spark, tmp_path):
    """The monitoring accumulation compacts mid-stream and the published
    report still equals the batch detector over the union."""
    import datetime as dt

    from ideafast_etl_spark.operators.timeseries import cusum_drift
    from ideafast_etl_spark.streaming.monitoring import run_cusum_stream

    schema = "event_id long, ts timestamp, user_id long, value double"
    t0 = dt.datetime(2024, 3, 1)

    def rows(base, vals):
        return [
            (base + i, t0 + dt.timedelta(hours=base + i), 1, float(v))
            for i, v in enumerate(vals)
        ]

    r1, r2 = rows(0, [100.0, 0.0, 0.0, 0.0]), rows(10, [0.0, 80.0, 90.0])
    src = str(tmp_path / "ev")
    accum, out, ckpt = (
        str(tmp_path / "accum"), str(tmp_path / "report"), str(tmp_path / "ck")
    )
    kw = dict(threshold=20.0, checkpoint_dir=ckpt, compact_after_batches=1)

    spark.createDataFrame(r1, schema).coalesce(1).write.mode("append").parquet(src)
    q = run_cusum_stream(spark, src, schema, accum, out, **kw)
    q.awaitTermination(120)
    spark.createDataFrame(r2, schema).coalesce(1).write.mode("append").parquet(src)
    q = run_cusum_stream(spark, src, schema, accum, out, **kw)
    q.awaitTermination(120)

    # batch 0 folded during batch 1's cycle; batch 1 (not yet committed
    # at its own cycle time) remains as the tail
    assert os.path.isdir(f"{accum}/compact-0")
    assert set(_batch_dirs(accum)) == {1}
    both = spark.createDataFrame(r1 + r2, schema)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, cusum_drift(both, threshold=20.0).collect()))
    assert got == want
