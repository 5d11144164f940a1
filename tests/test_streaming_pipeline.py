"""Streaming-ingest pipeline run: drain files via checkpointed streaming,
then resolve/group/upload over the refreshed state."""

from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ideafast_etl_spark.pipeline import DreemPipeline
from ideafast_etl_spark.sources.rest import PaginatedRestSource, mock_dreem_api
from ideafast_etl_spark.state import StateStore

API_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("device", StringType()),
        StructField(
            "report",
            StructType(
                [
                    StructField("start_time", LongType()),
                    StructField("stop_time", LongType()),
                ]
            ),
        ),
        StructField("data_url", StringType()),
    ]
)


def test_streaming_pipeline_run_and_incremental_redrain(spark, tmp_path):
    uid_map = spark.createDataFrame(
        [(f"uid-{i}", f"SER-{i:03d}") for i in range(7)], ["dreem_uid", "device_serial"]
    )
    serial_map = spark.createDataFrame(
        [(f"SER-{i:03d}", f"NR{i}-DEVICE") for i in range(7)],
        ["device_serial", "device_id"],
    )
    assignments = spark.createDataFrame(
        [(f"NR{i}-DEVICE", f"P{i}-PATIENT", datetime(2021, 12, 1), None) for i in range(7)],
        "device_id string, patient_id string, start_wear timestamp, end_wear timestamp",
    )
    feed = tmp_path / "feed"
    api = PaginatedRestSource(mock_dreem_api(25), API_SCHEMA).load(spark)
    api.coalesce(1).write.parquet(str(feed / "b1"))

    store = StateStore(spark, str(tmp_path / "state"))
    pipe = DreemPipeline(spark, store)
    report = pipe.run_from_stream(
        str(feed) + "/*/", API_SCHEMA, uid_map, serial_map, assignments,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert report["ingested"] == 25
    assert report["serials"] == 25
    assert store.read().filter(F.col("dmp_id").isNotNull()).count() == 25

    # second drain: a new file with overlap → only the delta ingests
    api2 = PaginatedRestSource(mock_dreem_api(35), API_SCHEMA).load(spark)
    api2.coalesce(1).write.parquet(str(feed / "b2"))
    report2 = pipe.run_from_stream(
        str(feed) + "/*/", API_SCHEMA, uid_map, serial_map, assignments,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert report2["ingested"] == 10
    assert store.read().count() == 35
