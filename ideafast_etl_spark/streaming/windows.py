"""Streaming windowed aggregation with watermarks (SURVEY.md §2.11 — the
reference's day-bucket grouping, expressed as a real streaming window).

``windowed_group_counts`` is G1-as-a-stream: tumbling windows with the
cut-off expressed as ``startTime`` offset, watermark bounding state for late
data. In the batch pipeline late rows simply retry (NULL-rung predicates);
in streaming the watermark is the explicit contract: rows later than the
watermark are dropped and the window state is reclaimed — that bound is what
keeps state finite at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.grouping import _parse_cutoff


def windowed_group_counts(
    stream: DataFrame,
    ts_col: str = "start",
    device_col: str = "device_id",
    patient_col: str = "patient_id",
    cut_off: str = "12:00:00",
    watermark: str = "2 days",
) -> DataFrame:
    """Per (device, patient, day-window) counts over a stream. The window
    boundary sits at ``cut_off`` (offset tumbling window), matching the batch
    G1 semantics exactly: a record at 11:59:59 with a 12:00 cut-off belongs
    to the window that STARTED yesterday at 12:00."""
    secs = _parse_cutoff(cut_off)
    win = F.window(
        F.col(ts_col), "1 day", startTime=f"{secs} seconds"
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(device_col), F.col(patient_col), win.alias("win"))
        .agg(F.count(F.lit(1)).alias("n_records"))
        .select(
            device_col,
            patient_col,
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_records",
        )
    )


def session_window_stats(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 days",
) -> DataFrame:
    """Gap-based session windows (`F.session_window`): events of a key whose
    timestamps fall within ``gap`` of each other merge into one session —
    Spark's native mergeable-window state, the streaming twin of the batch
    lag()+cumsum sessionization (queries.py::sessionization). Works on both
    a batch frame and a stream (the watermark bounds session state; closed
    sessions emit and release, which is what keeps per-key state finite on
    an unbounded feed)."""
    sw = F.session_window(F.col(ts_col), gap)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), sw.alias("sess"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )
