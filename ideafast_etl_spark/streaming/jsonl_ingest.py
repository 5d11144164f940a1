"""Streaming JSONL ingest: the corpus front door. New JSONL shards land in
a drop directory (crawler output, vendor deliveries); each ``availableNow``
drain parses them with the SAME schema-pinned quarantine discipline as the
batch reader (sources/jsonl.py) and extends two accumulated relations:

  - ``corpus_dir/batch-<id>/``     — parsed good rows (parquet),
  - ``quarantine_dir/batch-<id>/`` — raw offending lines + batch id.

Both writes are batch-id-keyed OVERWRITE directories, so a micro-batch
replayed after a crash between write and checkpoint commit lands on the
same directory instead of double-appending (the monitoring.py idempotency
discipline). Readers consume the accumulation with a recursive parquet
read; downstream prep is streaming/corpus.py's job.

This is the missing first stage of the reference's poll cycle
(/root/reference/README.md:124-131: wake, fetch what is new, record it)
re-expressed as a file-watch stream: Spark's file source tracks processed
files in the checkpoint, so a shard is ingested exactly once across
restarts without any bookkeeping table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..sources.jsonl import parse_jsonl_lines
from .accum import compact_accumulation, guard_fresh_checkpoint


def run_jsonl_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    corpus_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str | None = None,
    compact_after_batches: int | None = None,
    quarantine_retain_batches: int | None = None,
) -> StreamingQuery:
    """Drain ``source_dir`` (``*.jsonl`` text files) into the accumulated
    corpus + quarantine relations. Exactly-once per shard via the file
    source's checkpointed file log; idempotent per micro-batch via
    batch-id-keyed overwrite. Returns the started query (availableNow —
    call ``awaitTermination()`` to drain).

    ``compact_after_batches``: fold committed batch directories into one
    consolidated snapshot whenever either accumulation holds that many
    (accum.compact_accumulation) — bounds the directory growth of a
    long-lived ingest without giving back the O(delta) writes.

    ``quarantine_retain_batches`` (r9 verdict #6): expire quarantined
    lines older than that many committed batches at compaction time —
    without it a year of drains keeps every malformed line forever. The
    CORPUS accumulation is never retention-filtered (it is the data, not
    a log), and the file-source exactly-once markers are untouched."""
    if checkpoint_dir is None:
        checkpoint_dir = corpus_dir.rstrip("/") + ".checkpoint"
    guard_fresh_checkpoint(checkpoint_dir, corpus_dir, quarantine_dir)

    def _cycle(batch_df: DataFrame, batch_id: int) -> None:
        good, quarantine = parse_jsonl_lines(batch_df, schema)
        good.write.mode("overwrite").parquet(
            f"{corpus_dir.rstrip('/')}/batch-{batch_id}"
        )
        quarantine.withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        ).write.mode("overwrite").parquet(
            f"{quarantine_dir.rstrip('/')}/batch-{batch_id}"
        )
        if compact_after_batches is not None:
            from .accum import _batch_dirs

            for d, retain in (
                (corpus_dir, None),
                (quarantine_dir, quarantine_retain_batches),
            ):
                if len(_batch_dirs(d)) >= compact_after_batches:
                    compact_accumulation(
                        spark, d, checkpoint_dir, retain_batches=retain
                    )

    stream = (
        spark.readStream.format("text")
        .option("pathGlobFilter", "*.jsonl")
        .load(source_dir)
    )
    return (
        stream.writeStream.foreachBatch(_cycle)
        .trigger(availableNow=True)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_ingested(spark: SparkSession, accum_dir: str) -> DataFrame:
    """The accumulated relation across all drained batches (compaction-
    and crash-window-aware — see accum.read_accumulation)."""
    from .accum import read_accumulation

    return read_accumulation(spark, accum_dir)
