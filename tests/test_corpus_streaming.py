"""Streaming twin of the corpus-prep pipeline (streaming/corpus.py):
after draining all files, the published survivors and stage-report
snapshots equal the batch pipeline run on the union of the same rows —
including the cross-batch interactions (a wave-2 exact dup of a wave-1
doc is suppressed; a boilerplate line crossing the line-dedup frequency
threshold only once wave 2 lands disappears from wave-1 docs too)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ideafast_etl_spark.pipeline.corpus import corpus_prep
from ideafast_etl_spark.streaming.corpus import run_corpus_prep_stream

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)

GOOD = (
    "The river cuts through the valley, and the morning light settles on "
    "the rooftops. Markets open slowly; traders arrange their stalls with "
    "practiced care, greeting the first customers of the day warmly."
)
GOOD2 = (
    "Engineers reviewed the design over several weeks, testing each "
    "component under load. The final report described the methodology, "
    "the measured results, and the remaining open questions in detail."
)
BOILER = "Subscribe to our newsletter for updates."


def _rows(*pairs):
    return list(pairs)


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _drain(spark, src, accum, surv, rep, ckpt):
    q = run_corpus_prep_stream(
        spark, src, SCHEMA, accum, surv, rep, checkpoint_dir=ckpt
    )
    q.awaitTermination(120)


def _snap(spark, d):
    from ideafast_etl_spark.streaming.monitoring import latest_report_dir

    return sorted(
        map(tuple, spark.read.parquet(latest_report_dir(d)).collect())
    )


def test_two_drains_equal_batch_on_union(spark, tmp_path):
    src = str(tmp_path / "src")
    accum, surv, rep, ckpt = (
        str(tmp_path / "accum"),
        str(tmp_path / "surv"),
        str(tmp_path / "rep"),
        str(tmp_path / "ckpt"),
    )
    # wave 1: two good docs, each ending in the same boilerplate line
    w1 = _rows(
        (1, GOOD + "\n" + BOILER),
        (2, GOOD2 + "\n" + BOILER),
    )
    _write(spark, src, w1)
    _drain(spark, src, accum, surv, rep, ckpt)

    b_surv, b_rep = corpus_prep(spark.createDataFrame(w1, SCHEMA))
    assert _snap(spark, surv) == sorted(map(tuple, b_surv.collect()))
    assert _snap(spark, rep) == sorted(map(tuple, b_rep.collect()))

    # wave 2: an exact normalized copy of doc 1 (case change only) + a
    # third boilerplate carrier + a fresh doc
    w2 = _rows(
        (10, (GOOD + "\n" + BOILER).upper()),
        (11, GOOD2.replace("Engineers", "Physicists") + "\n" + BOILER),
    )
    _write(spark, src, w2)
    _drain(spark, src, accum, surv, rep, ckpt)

    union = spark.createDataFrame(w1 + w2, SCHEMA)
    b_surv, b_rep = corpus_prep(union)
    got_surv = _snap(spark, surv)
    assert got_surv == sorted(map(tuple, b_surv.collect()))
    assert _snap(spark, rep) == sorted(map(tuple, b_rep.collect()))
    # cross-batch semantics actually exercised: wave-2's normalized copy
    # of doc 1 did not survive, and doc 1 (the first id) did
    ids = {t[0] for t in got_surv}
    assert 1 in ids and 10 not in ids


def test_drain_is_idempotent_without_new_files(spark, tmp_path):
    src = str(tmp_path / "s2")
    accum, surv, rep, ckpt = (
        str(tmp_path / "a2"),
        str(tmp_path / "sv2"),
        str(tmp_path / "rp2"),
        str(tmp_path / "ck2"),
    )
    w1 = _rows((1, GOOD), (2, GOOD2))
    _write(spark, src, w1)
    _drain(spark, src, accum, surv, rep, ckpt)
    first = (_snap(spark, surv), _snap(spark, rep))
    _drain(spark, src, accum, surv, rep, ckpt)  # no new files
    assert (_snap(spark, surv), _snap(spark, rep)) == first
    n = (
        spark.read.option("recursiveFileLookup", "true").parquet(accum).count()
    )
    assert n == 2  # raw accumulation did not double


def test_retention_bounds_the_recompute(spark, tmp_path):
    """Production knob: docs outside the horizon are excluded from the
    chain but stay in the raw accumulation."""
    src = str(tmp_path / "s3")
    accum, surv, rep, ckpt = (
        str(tmp_path / "a3"),
        str(tmp_path / "sv3"),
        str(tmp_path / "rp3"),
        str(tmp_path / "ck3"),
    )
    _write(spark, src, _rows((1, GOOD), (100, GOOD2)))
    q = run_corpus_prep_stream(
        spark, src, SCHEMA, accum, surv, rep,
        checkpoint_dir=ckpt,
        retention=lambda df: df.filter(F.col("doc_id") >= 50),
    )
    q.awaitTermination(120)
    ids = {t[0] for t in _snap(spark, surv)}
    assert ids == {100}
    assert (
        spark.read.option("recursiveFileLookup", "true").parquet(accum).count()
        == 2
    )
