"""Streaming JSONL ingest (streaming/jsonl_ingest.py): after draining,
the accumulated corpus + quarantine equal the batch reader on the union
of the same shard files; a shard landing between drains is picked up
exactly once; a replayed micro-batch does not duplicate rows."""

from pyspark.sql import functions as F

from ideafast_etl_spark.sources.jsonl import read_jsonl
from ideafast_etl_spark.streaming.jsonl_ingest import (
    read_ingested,
    run_jsonl_ingest_stream,
)

SCHEMA = "doc_id long, text string"


def _drain(spark, src, corpus, quar, ckpt):
    q = run_jsonl_ingest_stream(spark, src, SCHEMA, corpus, quar, ckpt)
    q.awaitTermination()


def _setup(tmp_path):
    for d in ("src", "corpus", "quar"):
        (tmp_path / d).mkdir()
    return (
        str(tmp_path / "src"),
        str(tmp_path / "corpus"),
        str(tmp_path / "quar"),
        str(tmp_path / "ckpt"),
    )


def test_two_drains_equal_batch_reader_on_union(spark, tmp_path):
    src, corpus, quar, ckpt = _setup(tmp_path)
    (tmp_path / "src" / "wave1.jsonl").write_text(
        '{"doc_id": 1, "text": "a"}\nBROKEN LINE\n{"doc_id": 2, "text": "b"}\n'
    )
    _drain(spark, src, corpus, quar, ckpt)
    # a second shard arrives between drains
    (tmp_path / "src" / "wave2.jsonl").write_text(
        '{"doc_id": 3, "text": "c"}\n{"doc_id": "bad-type", "text": "d"}\n'
    )
    _drain(spark, src, corpus, quar, ckpt)

    got = sorted(
        map(tuple, read_ingested(spark, corpus).select("doc_id", "text").collect())
    )
    good_b, quar_b = read_jsonl(spark, f"{src}/*.jsonl", SCHEMA)
    want = sorted(map(tuple, good_b.select("doc_id", "text").collect()))
    assert got == want == [(1, "a"), (2, "b"), (3, "c")]

    q_stream = sorted(
        r.raw_line for r in read_ingested(spark, quar).collect()
    )
    q_batch = sorted(r.raw_line for r in quar_b.collect())
    assert q_stream == q_batch and len(q_stream) == 2


def test_shard_ingested_exactly_once_across_restarts(spark, tmp_path):
    src, corpus, quar, ckpt = _setup(tmp_path)
    (tmp_path / "src" / "only.jsonl").write_text(
        '{"doc_id": 10, "text": "x"}\n'
    )
    _drain(spark, src, corpus, quar, ckpt)
    # restart with the same checkpoint: the file log skips the seen shard
    _drain(spark, src, corpus, quar, ckpt)
    assert read_ingested(spark, corpus).count() == 1


def test_replayed_batch_is_idempotent(spark, tmp_path):
    src, corpus, quar, ckpt = _setup(tmp_path)
    (tmp_path / "src" / "w.jsonl").write_text(
        '{"doc_id": 1, "text": "a"}\nNOPE\n'
    )
    _drain(spark, src, corpus, quar, ckpt)
    # simulate a crash between the writes and the checkpoint commit: re-run
    # the cycle body with the SAME batch id over the same input
    from ideafast_etl_spark.sources.jsonl import parse_jsonl_lines

    lines = spark.read.text(f"{src}/w.jsonl")
    good, quarantine = parse_jsonl_lines(lines, SCHEMA)
    good.write.mode("overwrite").parquet(f"{corpus}/batch-0")
    quarantine.withColumn(
        "batch_id", F.lit(0).cast("long")
    ).write.mode("overwrite").parquet(f"{quar}/batch-0")

    assert read_ingested(spark, corpus).count() == 1
    assert read_ingested(spark, quar).count() == 1


def test_jsonl_front_door_feeds_corpus_prep_stream(spark, tmp_path):
    """Capstone integration: JSONL shards drop in → ingest stream parses/
    quarantines → corpus-prep stream consumes the accumulated parquet →
    published survivors equal the batch pipeline on the batch reader's
    good rows. The full 'new crawl arrives' path, front door to corpus."""
    import json

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ideafast_etl_spark.pipeline.corpus import corpus_prep
    from ideafast_etl_spark.streaming.corpus import run_corpus_prep_stream

    src, corpus, quar, ckpt = _setup(tmp_path)
    good_text = (
        "The river cuts through the valley, and the morning light settles "
        "on the rooftops. Markets open slowly; traders arrange their "
        "stalls with practiced care, greeting the first customers warmly."
    )
    good_text2 = (
        "Engineers reviewed the design over several weeks, testing each "
        "component under load. The final report described the methodology "
        "and the measured results in considerable detail for posterity."
    )
    shard = "\n".join(
        [
            json.dumps({"doc_id": 1, "text": good_text}),
            "THIS LINE IS NOT JSON",
            json.dumps({"doc_id": 2, "text": good_text2}),
            json.dumps({"doc_id": 3, "text": good_text}),  # exact dup of 1
        ]
    )
    (tmp_path / "src" / "crawl.jsonl").write_text(shard + "\n")
    _drain(spark, src, corpus, quar, ckpt)

    surv = str(tmp_path / "surv")
    rep = str(tmp_path / "rep")
    prep_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
        ]
    )
    q = run_corpus_prep_stream(
        spark,
        f"{corpus}/batch-*",  # the ingest's batch-id-keyed accumulation
        prep_schema,
        str(tmp_path / "prep_accum"),
        surv,
        rep,
        checkpoint_dir=str(tmp_path / "prep_ckpt"),
    )
    q.awaitTermination(120)

    good_b, _ = read_jsonl(spark, f"{src}/*.jsonl", SCHEMA)
    want_surv, _ = corpus_prep(good_b)
    from ideafast_etl_spark.streaming.monitoring import latest_report_dir

    got = sorted(
        map(tuple, spark.read.parquet(latest_report_dir(surv)).collect())
    )
    want = sorted(map(tuple, want_surv.collect()))
    assert got == want
    # the broken line is in quarantine, the dup doc was removed by prep
    assert read_ingested(spark, quar).count() == 1
    assert {r[0] for r in got} == {1, 2}
