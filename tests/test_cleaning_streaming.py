"""The cleaning heuristics are stateless projections, so they must run
UNCHANGED under Structured Streaming (the 100 TB ingest posture: score
quality/PII at ingest time, not in a second batch pass). Batch and
availableNow-stream results over the same files must be identical."""

from pyspark.sql import functions as F

from ideafast_etl_spark.operators import cleaning


def _docs(spark, tmp_path):
    d = str(tmp_path / "docs_feed")
    rows = [
        (1, "This line has five good words.\nmail a@b.co now..."),
        (2, "Enable javascript to continue here.\n- bullet item"),
        (3, "the of and that have with be to " * 10),
        (4, ""),
        (5, "call 555-867-5309, ssn 123-45-6789, host 10.0.0.1 done."),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        2
    ).write.parquet(d)
    return d


def test_cleaning_ops_stream_equals_batch(spark, tmp_path):
    d = _docs(spark, tmp_path)
    batch_df = spark.read.parquet(d)
    stream_df = spark.readStream.schema("doc_id long, text string").parquet(d)
    for name, op in [
        ("gopher", cleaning.gopher_quality),
        ("c4", cleaning.c4_clean),
        ("pii", cleaning.pii_redaction),
        ("chunks", cleaning.doc_chunks),
    ]:
        want = sorted(map(tuple, op(batch_df).collect()))
        q = (
            op(stream_df)
            .writeStream.format("memory")
            .queryName(f"clean_{name}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(
            map(tuple, spark.sql(f"select * from clean_{name}").collect())
        )
        assert got == want, name


def test_streaming_quality_gate_filters(spark, tmp_path):
    """A Gopher keep-gate inside the stream: only passing docs reach the
    sink — the ingest-time corpus filter shape."""
    d = _docs(spark, tmp_path)
    stream_df = spark.readStream.schema("doc_id long, text string").parquet(d)
    gated = cleaning.gopher_quality(stream_df).filter(F.col("keep"))
    q = (
        gated.writeStream.format("memory")
        .queryName("gate")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = [r["doc_id"] for r in spark.sql("select * from gate").collect()]
    assert kept == [3]  # the only doc passing all seven Gopher rules
