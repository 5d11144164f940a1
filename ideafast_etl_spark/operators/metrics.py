"""Run-report metrics (SURVEY.md §2.7 G5) — Spark-native observability.

The reference logs found/new/resolved/updated counts in every task
(dags/dreem.py:70-73,107-115,144-151,230-234). The Spark-idiomatic form is
``df.observe``: named aggregates collected as a side effect of the action that
runs anyway — no extra pass over the data, unlike a separate ``count()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str = "stage") -> tuple[DataFrame, Observation]:
    """Attach a row-count + null-progress observation to a lifecycle stage
    DataFrame. After the caller's action, ``obs.get`` yields the run report
    without re-running the plan."""
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in ("device_serial", "device_id", "patient_id", "dmp_id"):
        if c in df.columns:
            metrics.append(
                F.sum(F.col(c).isNotNull().cast("long")).alias(f"n_{c}_resolved")
            )
    return df.observe(obs, *metrics), obs
