"""Streaming MinHash near-dup (streaming/neardup.py): cross-batch dup
detection against growing state, in-batch survivor rule, duplicate
suppression from state, checkpoint resume."""

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ideafast_etl_spark.streaming.neardup import run_streaming_near_dup

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the rain falls on "
    "the quiet town and the river runs beyond the old stone bridge"
)
OTHER = (
    "completely different content about spark queries shuffles partitions "
    "joins aggregations windows and the catalyst optimizer pipeline"
)


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _drain(spark, src, state, ckpt, log):
    q = run_streaming_near_dup(
        spark, src, SCHEMA, state, checkpoint_dir=ckpt, dup_log=log
    )
    q.awaitTermination(120)


def test_cross_batch_near_dup_detected(spark, tmp_path):
    src, state, ckpt = (
        str(tmp_path / "src"), str(tmp_path / "state"), str(tmp_path / "ck")
    )
    log: list = []
    _write(spark, src, [(1, BASE), (2, OTHER)])
    _drain(spark, src, state, ckpt, log)
    assert log == []  # first wave: nothing seen yet, both survive
    assert spark.read.parquet(state).count() == 2

    # wave 2: near-copy of doc 1 (one word changed) + a fresh doc
    near = BASE.replace("quiet", "silent")
    _write(spark, src, [(10, near), (11, "entirely novel text about flac codecs and rice residual coding schemes")])
    _drain(spark, src, state, ckpt, log)
    assert [(e[1], e[2]) for e in log] == [(10, 1)]
    assert log[0][3] >= 0.5
    # duplicate 10 suppressed from state; 11 appended
    ids = {r.doc_id for r in spark.read.parquet(state).collect()}
    assert ids == {1, 2, 11}


def test_in_batch_dup_single_survivor(spark, tmp_path):
    src, state, ckpt = (
        str(tmp_path / "s2"), str(tmp_path / "st2"), str(tmp_path / "ck2")
    )
    log: list = []
    _write(spark, src, [(5, BASE), (6, BASE), (7, OTHER)])
    _drain(spark, src, state, ckpt, log)
    # 6 matches 5 in-batch (id order: the smaller id survives)
    assert [(e[1], e[2]) for e in log] == [(6, 5)]
    ids = {r.doc_id for r in spark.read.parquet(state).collect()}
    assert ids == {5, 7}


def test_checkpoint_skips_consumed_files(spark, tmp_path):
    src, state, ckpt = (
        str(tmp_path / "s3"), str(tmp_path / "st3"), str(tmp_path / "ck3")
    )
    log: list = []
    _write(spark, src, [(1, BASE)])
    _drain(spark, src, state, ckpt, log)
    _drain(spark, src, state, ckpt, log)  # re-run: no new files, no growth
    assert log == []
    assert spark.read.parquet(state).count() == 1


def test_exact_copy_scores_full_similarity(spark, tmp_path):
    src, state, ckpt = (
        str(tmp_path / "s4"), str(tmp_path / "st4"), str(tmp_path / "ck4")
    )
    log: list = []
    _write(spark, src, [(1, BASE)])
    _drain(spark, src, state, ckpt, log)
    _write(spark, src, [(2, BASE)])
    _drain(spark, src, state, ckpt, log)
    assert [(e[1], e[2], e[3]) for e in log] == [(2, 1, 1.0)]
