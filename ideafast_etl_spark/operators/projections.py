"""Projections / per-row shaping (SURVEY.md §2.5, P1-P5).

Pure ``select``-based transforms — Catalyst column-prunes through them, so a
downstream 2-column consumer reads 2 columns off parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import epoch_seconds_to_ts, parse_weartime, record_hash


def shape_api_rows(raw: DataFrame, device_type: str) -> DataFrame:
    """P2 — vendor API row → record shape (dags/dreem.py:52-64): rename
    ``id``→``manufacturer_ref``, ``device``→``meta.dreem_uid``, epoch-seconds
    report times → timestamps, compute the dedup hash (X1)."""
    return raw.select(
        record_hash(F.lit(device_type), F.col("id")).alias("hash"),
        F.col("id").cast("string").alias("manufacturer_ref"),
        F.lit(device_type).alias("device_type"),
        epoch_seconds_to_ts(F.col("report.start_time")).alias("start"),
        epoch_seconds_to_ts(F.col("report.stop_time")).alias("end"),
        F.create_map(F.lit("dreem_uid"), F.col("device").cast("string")).alias("meta"),
    )


def init_lifecycle(df: DataFrame) -> DataFrame:
    """P1-adjacent — add the NULL lifecycle columns a fresh record carries
    (FIXTURES.md §1); NULL-ness encodes pipeline progress (SURVEY.md §1.3)."""
    out = df
    for c in ("device_serial", "device_id", "patient_id", "dmp_dataset", "dmp_id"):
        if c not in out.columns:
            out = out.withColumn(c, F.lit(None).cast("string"))
    if "is_uploaded" not in out.columns:
        out = out.withColumn("is_uploaded", F.lit(False))
    return out


def shape_ucam_patients(raw: DataFrame) -> DataFrame:
    """P3/P4 — UCAM device payload → flattened wear-assignment rows
    (ideafast_etl/hooks/ucam.py:42-77): explode the nested patients array,
    rename vendor fields, parse ISO-ish timestamps; ``end_Date`` stays NULL
    for still-worn devices."""
    exploded = raw.select(
        F.col("device_id"), F.explode(F.col("patients")).alias("p")
    )
    return exploded.select(
        F.col("device_id"),
        F.col("p.subject_id").alias("patient_id"),
        F.col("p.disease").cast("int").alias("disease"),
        parse_weartime(F.col("p.start_Date")).alias("start_wear"),
        parse_weartime(F.col("p.end_Date")).alias("end_wear"),
        F.col("p.deviations").alias("deviations"),
        F.col("p.vtT_id").alias("vttsma_id"),
        F.lit(None).cast("string").alias("dmp_dataset"),
    )


def parse_group_filename(df: DataFrame, path_col: str = "path") -> DataFrame:
    """P5 — parse ``PATIENT-DEVICE-START-END`` from a file stem
    (ideafast_etl/hooks/dmp.py:68)."""
    stem = F.regexp_extract(F.col(path_col), r"([^/]+)\.[^./]+$", 1)
    parts = F.split(stem, "-")
    return df.withColumn("patient_id", parts.getItem(0)).withColumn(
        "device_id", parts.getItem(1)
    ).withColumn("group_start", parts.getItem(2)).withColumn(
        "group_end", parts.getItem(3)
    )
