"""JSONL corpus source/sink (sources/jsonl.py)."""

from pyspark.sql import functions as F

from ideafast_etl_spark.sources.jsonl import read_jsonl, write_jsonl_shards


def test_read_splits_good_and_quarantine(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        "this is not json\n"
        '{"doc_id": "NaN-ish", "text": "type violation"}\n'
        '{"doc_id": 2, "text": "also ok"}\n'
    )
    good, quarantine = read_jsonl(spark, str(p), "doc_id long, text string")
    got = {r.doc_id: r.text for r in good.collect()}
    assert got == {1: "ok", 2: "also ok"}
    raw = [r.raw_line for r in quarantine.collect()]
    assert len(raw) == 2
    assert any("not json" in r for r in raw)
    assert any("NaN-ish" in r for r in raw)  # evidence preserved verbatim


def test_clean_file_has_empty_quarantine(spark, tmp_path):
    p = tmp_path / "clean.jsonl"
    p.write_text('{"doc_id": 1, "text": "a"}\n{"doc_id": 2, "text": "b"}\n')
    good, quarantine = read_jsonl(spark, str(p), "doc_id long, text string")
    assert good.count() == 2
    assert quarantine.count() == 0


def test_sharded_write_roundtrip_and_determinism(spark, tmp_path):
    df = spark.range(95).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
    )
    out = str(tmp_path / "shards")
    n = write_jsonl_shards(
        df, out, [F.col("doc_id").asc()], rows_per_shard=10
    )
    assert n == 10  # 9 full + 1 ragged
    back = spark.read.schema("doc_id long, text string, shard long").json(
        out
    )
    assert back.count() == 95
    # shard membership is the exact rank rule: doc_id k lives in shard k//10
    bad = back.filter(F.col("shard") != (F.col("doc_id") / 10).cast("long"))
    assert bad.count() == 0
    # re-export reproduces identical membership (diffable/resumable exports)
    out2 = str(tmp_path / "shards2")
    write_jsonl_shards(
        df.repartition(7), out2, [F.col("doc_id").asc()], rows_per_shard=10
    )
    back2 = spark.read.schema("doc_id long, text string, shard long").json(
        out2
    )
    a = sorted(map(tuple, back.collect()))
    b = sorted(map(tuple, back2.collect()))
    assert a == b


def test_roundtrip_through_quarantine_free_reader(spark, tmp_path):
    df = spark.range(20).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id")).alias("text"),
    )
    out = str(tmp_path / "rt")
    write_jsonl_shards(df, out, [F.col("doc_id").asc()], rows_per_shard=7)
    good, quarantine = read_jsonl(
        spark, f"{out}/shard=*/*.json", "doc_id long, text string"
    )
    assert quarantine.count() == 0
    assert sorted(r.doc_id for r in good.collect()) == list(range(20))
