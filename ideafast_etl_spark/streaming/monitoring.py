"""Streaming twins for the monitoring/detection operators (SURVEY.md §2.11
posture + the r6 analytics batch): CUSUM level-shift, rolling z-score, and
heartbeat-gap detection as ``availableNow`` foreachBatch jobs.

These detectors are windows over per-key event HISTORY, so unlike the
stateless cleaning heuristics (streaming/cleaning parity tests) they cannot
run as pure stream projections: the correct incremental deployment is the
reference's own poll cycle shape (/root/reference/README.md:124-131 — wake,
drain what is new, recompute the worklist) expressed Spark-natively:

  1. the file stream drains new event files one idempotent micro-batch at a
     time (checkpointed — re-runs skip consumed files),
  2. each micro-batch APPENDS its rows to an accumulation parquet relation
     (O(delta) write, never a rewrite of history),
  3. the batch detector recomputes over the accumulated relation and
     publishes a fresh report snapshot.

Step 3 re-reads accumulated history each cycle — that is the price of
exact parity with the batch operator (CUSUM's mean is global per key).
At 100 TB you bound it with ``retention``: a predicate that drops events
older than the monitoring horizon before detection, making the recompute
O(horizon) instead of O(history) while steps 1-2 stay O(delta). The
stream≡batch parity tests (tests/test_monitoring_streaming.py) prove the
drained result equals the one-shot batch run on the same files.

Report publication is a staged-directory swap (write to ``<out>.staged``,
then atomic rename over ``<out>``) so a reader never sees a half-written
snapshot — the state store's pointer-swap discipline (state/store.py)
applied to report output.
"""

from __future__ import annotations

import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from ..operators.timeseries import cusum_drift, heartbeat_gaps, rolling_zscore


def _publish(report: DataFrame, out_dir: str) -> None:
    """Write ``report`` as a parquet snapshot at ``out_dir`` via staged
    rename — readers see the old snapshot or the new one, never a mix."""
    staged = out_dir.rstrip("/") + ".staged"
    if os.path.exists(staged):
        shutil.rmtree(staged)
    report.write.mode("overwrite").parquet(staged)
    old = out_dir.rstrip("/") + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(out_dir):
        os.rename(out_dir, old)
    os.rename(staged, out_dir)
    if os.path.exists(old):
        shutil.rmtree(old)


def run_detector_stream(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    detector: Callable[[DataFrame], DataFrame],
    accum_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    retention: Callable[[DataFrame], DataFrame] | None = None,
    fmt: str = "parquet",
) -> StreamingQuery:
    """Drain ``source_dir`` and maintain a detection-report snapshot.

    ``detector`` is any batch detector DataFrame→DataFrame (the three
    wrappers below pre-bind the r6 detectors). ``retention`` optionally
    narrows the accumulated relation before detection (the bounded-state
    knob for production horizons); omit it for exact full-history parity
    with the batch operator."""

    def _cycle(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(accum_dir)
        hist = spark.read.parquet(accum_dir)
        if retention is not None:
            hist = retention(hist)
        _publish(detector(hist), out_dir)

    stream = spark.readStream.format(fmt).schema(schema).load(source_dir)
    writer = (
        stream.writeStream.foreachBatch(_cycle)
        .trigger(availableNow=True)
        .outputMode("update")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def run_cusum_stream(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    accum_dir: str,
    out_dir: str,
    threshold: float = 100.0,
    **kw,
) -> StreamingQuery:
    """CUSUM level-shift monitoring as an incremental drain job."""
    return run_detector_stream(
        spark, source_dir, schema,
        lambda df: cusum_drift(df, threshold=threshold),
        accum_dir, out_dir, **kw,
    )


def run_rolling_zscore_stream(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    accum_dir: str,
    out_dir: str,
    k: int = 24,
    z_threshold: float = 3.0,
    **kw,
) -> StreamingQuery:
    """Rolling z-score anomaly monitoring as an incremental drain job."""
    return run_detector_stream(
        spark, source_dir, schema,
        lambda df: rolling_zscore(df, k=k, z_threshold=z_threshold),
        accum_dir, out_dir, **kw,
    )


def run_psi_drift_stream(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    reference: DataFrame,
    accum_dir: str,
    out_dir: str,
    value_col: str = "value",
    lo: float = 0.0,
    hi: float = 500.0,
    n_bins: int = 20,
    **kw,
) -> StreamingQuery:
    """PSI distribution drift against a PINNED reference sample: each
    drain recomputes the per-bin (p−q)·ln(p/q) terms of the accumulated
    stream vs ``reference`` (the model-training-time feature snapshot) and
    publishes the bin report — the feature-monitoring loop a deployed
    model runs between data refreshes. The reference never changes
    (drift is measured against training time, not against yesterday), so
    it is captured once here; the stream side is O(delta) accumulation
    like the other detectors."""
    from ..operators.stats import distribution_drift

    return run_detector_stream(
        spark, source_dir, schema,
        lambda df: distribution_drift(
            reference, df, value_col, lo=lo, hi=hi, n_bins=n_bins
        ),
        accum_dir, out_dir, **kw,
    )


def run_gap_report_stream(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    accum_dir: str,
    out_dir: str,
    min_gap_s: int = 3600,
    **kw,
) -> StreamingQuery:
    """Heartbeat-gap monitoring as an incremental drain job."""
    return run_detector_stream(
        spark, source_dir, schema,
        lambda df: heartbeat_gaps(df, min_gap_s=min_gap_s),
        accum_dir, out_dir, **kw,
    )
