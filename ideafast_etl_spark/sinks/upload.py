"""Upload sink (SURVEY.md §2.2 K8-K10, reference dmp.py:59-177).

The reference streams one zip per upload group to a GraphQL multipart
endpoint, swallowing errors into a success boolean that drives the
at-least-once retry loop (is_uploaded stays false → group re-selected next
run). Spark-native shape: the per-group upload runs executor-side inside
``mapInPandas`` (one HTTP session per partition, not per row), and the
success booleans come back as a DataFrame the caller MERGEs into state —
no driver-side loop, arbitrarily many groups in flight.

The uploader is injected; the default is a stub that succeeds
deterministically (no network in this environment). A real implementation
would zip the group's files (K9) and POST with (4 s, 302 s) timeouts per the
reference; failure → False, never an exception (dmp.py:120-160).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

from pyspark.sql import DataFrame

# upload_one(dmp_id, payload_rows) -> success
Uploader = Callable[[str, pd.DataFrame], bool]


def stub_uploader(dmp_id: str, payload: pd.DataFrame) -> bool:
    """Deterministic stand-in: fails groups whose id hash ends in 'f' (~6%)
    so retry semantics are exercised end to end."""
    import hashlib

    return not hashlib.sha256(dmp_id.encode()).hexdigest().endswith("f")


def upload_groups(
    groups: DataFrame,
    uploader: Uploader = stub_uploader,
    group_col: str = "dmp_id",
) -> DataFrame:
    """Upload each group's rows; returns (dmp_id, success) — one row per
    group. Partitioned by group so one upload sees all member rows
    (``applyInPandas`` per group, Arrow-batched)."""

    def _upload(pdf: pd.DataFrame) -> pd.DataFrame:
        dmp_id = pdf[group_col].iloc[0]
        ok = uploader(dmp_id, pdf)
        return pd.DataFrame({group_col: [dmp_id], "success": [ok]})

    return groups.groupBy(group_col).applyInPandas(
        _upload, schema=f"{group_col} string, success boolean"
    )
