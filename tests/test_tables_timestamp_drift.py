"""tables.load must be invariant to how a fixture regeneration encodes
timestamps (TIMESTAMP(NANOS) → long-shim, micros-NTZ → LTZ normalisation):
every query sees canonical TIMESTAMP (LTZ) under the pinned UTC session.

Regression for the round-3 `sessionization` break: a driver fixture
regeneration flipped events.ts from nanos to timestamp[us] (read as
TIMESTAMP_NTZ) and `unix_micros` started raising DATATYPE_MISMATCH."""

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from ideafast_etl_spark import tables


def _write_events(path, unit):
    ts = [
        dt.datetime(2024, 1, 1, 10, 0, 0),
        dt.datetime(2024, 1, 1, 10, 10, 0),
        dt.datetime(2024, 1, 1, 11, 0, 0),  # 50-min gap → new session
    ]
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "user_id": pa.array([7, 7, 7], pa.int64()),
            "ts": pa.array(ts, pa.timestamp(unit)),
        }
    )
    pq.write_table(table, str(path))


def _check(spark, sf_dir):
    df = tables.load(spark, "events", str(sf_dir))
    # canonical type: TIMESTAMP (LTZ) — never NTZ, never long
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    # unix_micros (the call that broke under NTZ) must resolve
    n = df.select(F.unix_micros("ts").alias("us")).count()
    assert n == 3
    # window + interval-gap pipeline (the sessionization shape)
    w = Window.partitionBy("user_id").orderBy("ts")
    sess = (
        df.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            (
                F.col("prev_ts").isNull()
                | ((F.col("ts") - F.col("prev_ts")) > F.expr("INTERVAL 30 MINUTES"))
            ).cast("int"),
        )
        .agg(F.sum("new_sess").alias("n_sessions"))
        .collect()
    )
    assert sess[0]["n_sessions"] == 2
    # wall-clock values preserved under the UTC session
    first = df.orderBy("event_id").select("ts").first()["ts"]
    assert (first.hour, first.minute) == (10, 0)


def test_load_normalises_micros_ntz(spark, tmp_path):
    d = tmp_path / "sf_us"
    d.mkdir()
    _write_events(d / "events.parquet", "us")
    _check(spark, d)


def test_load_normalises_millis_ntz(spark, tmp_path):
    d = tmp_path / "sf_ms"
    d.mkdir()
    _write_events(d / "events.parquet", "ms")
    _check(spark, d)


def test_load_still_handles_nanos(spark, tmp_path):
    d = tmp_path / "sf_ns"
    d.mkdir()
    _write_events(d / "events.parquet", "ns")
    _check(spark, d)
