"""Streaming twin of the corpus-preparation pipeline (pipeline/corpus.py):
"a new crawl arrives, extend the corpus" as an ``availableNow`` drain job
— the actual deployment shape of corpus prep, mirroring the reference's
poll cycle (/root/reference/README.md:124-131: wake, drain what is new,
recompute the worklist).

The prep chain's dedup rungs are GLOBAL over document history (cross-doc
line frequencies, first-id-wins exact dedup), so like the detection twins
(streaming/monitoring.py) the correct incremental plan is:

  1. drain new document files one checkpointed micro-batch at a time,
  2. write each batch to a ``batch-<id>``-keyed subdirectory of the raw
     accumulation relation in OVERWRITE mode (O(delta), replay-idempotent),
  3. re-run the batch chain over the accumulated corpus and publish two
     snapshots: the surviving cleaned corpus and the per-stage report —
     via the manifest-committed versioned dirs (`monitoring._publish`;
     read through `monitoring.latest_report_dir`), so readers
     always resolve a complete snapshot.

Step 3's recompute is the price of EXACT parity with the batch pipeline
(the stream≡batch tests prove two drains equal one batch run on the
union). Production bounds it the same way the detectors do: a retention
predicate over the accumulated relation (drop documents past the crawl
horizon), making the recompute O(horizon) while ingestion stays O(delta).
A fully incremental variant (line-frequency state + seen-hash anti-join)
trades that exactness for O(delta) recompute — the MinHash version of
that trade already exists as streaming/neardup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from ..pipeline.corpus import corpus_prep
from .monitoring import _publish


def run_corpus_prep_stream(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    accum_dir: str,
    survivors_dir: str,
    report_dir: str,
    checkpoint_dir: str | None = None,
    text_col: str = "text",
    retention=None,
    fmt: str = "parquet",
    compact_after_batches: int | None = None,
) -> StreamingQuery:
    """Drain ``source_dir``; per micro-batch extend the raw corpus and
    publish fresh ``survivors``/``report`` snapshots. ``retention``
    optionally narrows the accumulated relation before the chain (the
    bounded-horizon production knob); omit for exact full-history parity
    with ``corpus_prep`` on the union of all drained files.
    ``compact_after_batches`` folds committed batch directories into one
    consolidated snapshot at that directory count (accum module)."""
    from .accum import (
        _batch_dirs,
        compact_accumulation,
        guard_fresh_checkpoint,
        read_accumulation,
    )

    if checkpoint_dir is None:
        checkpoint_dir = accum_dir.rstrip("/") + ".checkpoint"
    guard_fresh_checkpoint(checkpoint_dir, accum_dir)

    def _cycle(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{accum_dir.rstrip('/')}/batch-{batch_id}"
        )
        if (
            compact_after_batches is not None
            and len(_batch_dirs(accum_dir)) >= compact_after_batches
        ):
            compact_accumulation(spark, accum_dir, checkpoint_dir)
        hist = read_accumulation(spark, accum_dir)
        if retention is not None:
            hist = retention(hist)
        survivors, report = corpus_prep(hist, text_col)
        _publish(survivors, survivors_dir)
        _publish(report, report_dir)

    stream = spark.readStream.format(fmt).schema(schema).load(source_dir)
    return (
        stream.writeStream.foreachBatch(_cycle)
        .trigger(availableNow=True)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
