"""G5 observe-based run metrics, S2 distributed fetch, P5 filename parse."""

from pyspark.sql import functions as F

from ideafast_etl_spark.operators.metrics import observed
from ideafast_etl_spark.operators.projections import parse_group_filename
from ideafast_etl_spark.sources.files import distributed_fetch


def test_observed_counts_without_extra_pass(spark):
    df = spark.createDataFrame(
        [("h1", "S1", None), ("h2", None, None), ("h3", "S3", "D3")],
        "hash string, device_serial string, device_id string",
    )
    out, obs = observed(df, "stage2")
    out.collect()  # the action that would run anyway
    m = obs.get
    assert m["n_rows"] == 3
    assert m["n_device_serial_resolved"] == 2
    assert m["n_device_id_resolved"] == 1


def test_distributed_fetch_skips_unavailable(spark):
    refs = spark.createDataFrame(
        [("r1", "u://a"), ("r2", None), ("r3", "u://c")],
        "manufacturer_ref string, data_url string",
    )

    def fake_fetch(url):
        return f"content-of-{url}".encode() if url != "u://c" else None

    got = {r["manufacturer_ref"]: bytes(r["content"])
           for r in distributed_fetch(refs, fake_fetch).collect()}
    # r2 (no url yet, F9 late data) and r3 (fetch returned None) are skipped
    assert got == {"r1": b"content-of-u://a"}


def test_parse_group_filename(spark):
    df = spark.createDataFrame(
        [("/downloads/run1/APATIENT-NR1DEVICE-20211213-20211214.zip",)], ["path"]
    )
    row = parse_group_filename(df).first()
    assert (row["patient_id"], row["device_id"]) == ("APATIENT", "NR1DEVICE")
    assert (row["group_start"], row["group_end"]) == ("20211213", "20211214")
