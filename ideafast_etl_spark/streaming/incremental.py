"""Structured-Streaming variant of the incremental pipeline (SURVEY.md §2.11).

The reference's polling DAG is a hand-rolled micro-batch stream: each run
re-scans the source, anti-joins against the hash state, and appends the
delta. The Spark-native equivalent is a file-source stream +
``foreachBatch``: each micro-batch runs the same J1 anti-join + MERGE against
the state store, and ``trigger(availableNow=True)`` reproduces the
"poll when scheduled, drain everything available, stop" behaviour
(dags/dreem.py:25, README.md:124-131). Checkpointing makes re-runs skip
consumed files — the file-level complement of the row-level hash dedup.

``streaming_dedup`` is the pure-streaming flavor: ``withWatermark`` +
``dropDuplicates`` keyed on the content hash, for when the feed is a real
stream (Kafka at scale) rather than a polled snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from ..operators.projections import init_lifecycle, shape_api_rows
from ..state.store import StateStore


def run_streaming_ingest(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    store: StateStore,
    device_type: str = "DRM",
    checkpoint_dir: str | None = None,
    fmt: str = "parquet",
    inserted_counts: list[int] | None = None,
) -> StreamingQuery:
    """Drain all available files from ``source_dir`` into the state store,
    one idempotent micro-batch at a time. Pass ``inserted_counts`` to
    collect per-batch insert counts (foreachBatch runs driver-side, so a
    plain list suffices) — no post-hoc table counts needed."""

    def _ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        shaped = init_lifecycle(shape_api_rows(batch_df, device_type))
        n = store.append_new(shaped)
        if inserted_counts is not None:
            inserted_counts.append(n)

    stream = (
        spark.readStream.format(fmt)
        .schema(schema)
        .load(source_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(_ingest_batch)
        .trigger(availableNow=True)
        .outputMode("update")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def streaming_dedup(
    stream: DataFrame,
    hash_col: str = "hash",
    event_time_col: str = "start",
    watermark: str = "2 days",
    within_watermark: bool = False,
) -> DataFrame:
    """Row-level streaming dedup: keep the first occurrence of each content
    hash; state for hashes older than the watermark is dropped (bounded state
    at 100 TB — the polling/batch path keeps unbounded history instead).

    ``within_watermark=True`` uses ``dropDuplicatesWithinWatermark``: the
    right semantics when re-fetches of the same content carry *different*
    event times (the reference's poll cycles stamp each fetch) — duplicates
    are suppressed as long as they arrive within the watermark delay of the
    first sighting, instead of requiring an exact event-time match to share
    dedup state."""
    s = stream.withWatermark(event_time_col, watermark)
    if within_watermark:
        return s.dropDuplicatesWithinWatermark([hash_col])
    return s.dropDuplicates([hash_col])
