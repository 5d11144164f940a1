"""X1-X8 scalar function semantics (reference: tests/hooks/test_db.py:95-102)."""

import hashlib

from pyspark.sql import functions as F

from ideafast_etl_spark.functions import scalar


def test_record_hash_matches_sha256_concat(spark):
    # X1: sha256 over device_type ‖ ref with no separator (db.py:49-55)
    df = spark.createDataFrame([("DRM", "test_ref")], ["dt", "ref"])
    got = df.select(scalar.record_hash("dt", "ref").alias("h")).first()["h"]
    assert got == hashlib.sha256(b"DRMtest_ref").hexdigest()


def test_record_hash_sensitive_to_both_inputs(spark):
    # identical inputs → identical hash; either input differing → different
    rows = [("DRM", "a"), ("DRM", "a"), ("BTF", "a"), ("DRM", "b")]
    df = spark.createDataFrame(rows, ["dt", "ref"])
    hashes = [r["h"] for r in df.select(scalar.record_hash("dt", "ref").alias("h")).collect()]
    assert hashes[0] == hashes[1]
    assert len({hashes[0], hashes[2], hashes[3]}) == 3


def test_parse_weartime_and_normalise_day(spark):
    df = spark.createDataFrame([("2021-11-04T09:22:33",)], ["s"])
    out = df.select(
        scalar.parse_weartime("s").alias("ts"),
        scalar.normalise_day(scalar.parse_weartime("s")).alias("day"),
    ).first()
    assert str(out["ts"]) == "2021-11-04 09:22:33"
    assert str(out["day"]) == "2021-11-04 00:00:00"


def test_weartime_in_ms(spark):
    # X4: '20210101' → epoch millis (dmp.py:179-182)
    df = spark.createDataFrame([("20210101",)], ["d"])
    got = df.select(scalar.weartime_in_ms("d").alias("ms")).first()["ms"]
    assert got == 1609459200000


def test_group_key_strips_hyphens_and_formats_dates(spark):
    # operators/ucam.py:121-124 → DEVICEID-PATIENTID-YYYYMMDD-YYYYMMDD
    df = spark.createDataFrame(
        [("NR1-DEVICE", "A-PATIENT", "2021-12-13", "2021-12-13")],
        ["dev", "pat", "s", "e"],
    ).select(
        F.col("dev"),
        F.col("pat"),
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
    )
    got = df.select(scalar.group_key("dev", "pat", "s", "e").alias("k")).first()["k"]
    assert got == "NR1DEVICE-APATIENT-20211213-20211213"


def test_json_dot_path(spark):
    # X8: a.b.[1].c traversal incl. list indices (jwt.py:59-85)
    payload = '{"a": {"b": [{"c": "no"}, {"c": "tok"}]}}'
    df = spark.createDataFrame([(payload,)], ["j"])
    assert df.select(scalar.json_dot_path("j", "a.b.[1].c").alias("v")).first()["v"] == "tok"
    # absent path → NULL (reference raises KeyError; we are null-safe)
    assert df.select(scalar.json_dot_path("j", "a.x.y").alias("v")).first()["v"] is None


def test_udtf_tokenize_matches_jvm_explode(spark):
    """UDTF surface (§2.12): the Python table function must agree with the
    production JVM posexplode path on the same normalization."""
    from pyspark.sql import functions as F

    from ideafast_etl_spark.functions.udtfs import register_udtfs
    from ideafast_etl_spark.operators.dedup import _tokens

    register_udtfs(spark)
    docs = spark.createDataFrame(
        [(1, "Alpha  beta GAMMA"), (2, "one"), (3, None)],
        "doc_id long, text string",
    )
    docs.createOrReplaceTempView("udtf_docs")
    got = spark.sql(
        "SELECT doc_id, t.pos, t.token FROM udtf_docs, "
        "LATERAL tokenize(text) t ORDER BY doc_id, pos"
    ).collect()
    exp = (
        docs.select(
            "doc_id", F.posexplode(_tokens(F.col("text"))).alias("pos", "token")
        )
        .orderBy("doc_id", "pos")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in exp]
