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
    conflict_col: str | None = None,
    retry: "RetryPolicy | None" = None,
) -> DataFrame:
    """Upload each group's rows; returns one row per group — ``(dmp_id,
    success)``, plus a ``conflict`` flag when ``conflict_col`` is given.
    Partitioned by group so one upload sees all member rows
    (``applyInPandas`` per group, Arrow-batched).

    ``conflict_col`` names a boolean/int marker (e.g. the ``any_uploaded``
    window flag): a group carrying it is NOT uploaded — the guard runs on
    the executor that owns the whole group, so the skip is group-atomic
    (dags/dreem.py:185-204 partial-upload conflict).

    ``retry`` wraps the uploader in the reference's transport contract
    (dmp.py:126-136): bounded executor-side retries with backoff, and
    exhaustion ABSORBED into ``success=False`` (dmp.py:120-160 — transport
    failures feed the at-least-once loop, they never crash the job)."""
    if retry is not None:
        from ..sources.transport import retrying

        uploader = retrying(uploader, retry, absorb=lambda _e: False)

    def _upload(pdf: pd.DataFrame) -> pd.DataFrame:
        dmp_id = pdf[group_col].iloc[0]
        if conflict_col is not None:
            if bool(pdf[conflict_col].max()):
                return pd.DataFrame(
                    {group_col: [dmp_id], "success": [False], "conflict": [True]}
                )
            ok = uploader(dmp_id, pdf.drop(columns=[conflict_col]))
            return pd.DataFrame(
                {group_col: [dmp_id], "success": [ok], "conflict": [False]}
            )
        ok = uploader(dmp_id, pdf)
        return pd.DataFrame({group_col: [dmp_id], "success": [ok]})

    schema = f"{group_col} string, success boolean"
    if conflict_col is not None:
        schema += ", conflict boolean"
    return groups.groupBy(group_col).applyInPandas(_upload, schema=schema)


# archive_uploader(dmp_id, zip_bytes) -> success
ArchiveUploader = Callable[[str, bytes], bool]


def stub_archive_uploader(dmp_id: str, zip_bytes: bytes) -> bool:
    return len(zip_bytes) > 0


def upload_group_archives(
    groups: DataFrame,
    uploader: ArchiveUploader = stub_archive_uploader,
    group_col: str = "dmp_id",
    name_col: str = "manufacturer_ref",
    content_col: str = "content",
) -> DataFrame:
    """K8+K9 fused, fully distributed: each upload group's fetched file
    contents (S2 output) are zipped IN MEMORY on the executor that owns the
    group and handed to the uploader as one artifact — the reference's
    zip-folder-then-multipart flow (dmp.py:59-177) without any local-disk
    staging or driver involvement. Returns (dmp_id, n_files, zip_bytes_len,
    success) per group."""
    import io
    import zipfile

    def _upload(pdf: pd.DataFrame) -> pd.DataFrame:
        dmp_id = pdf[group_col].iloc[0]
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
            for r in pdf.sort_values(name_col).to_dict("records"):
                zf.writestr(f"{r[name_col]}.h5", bytes(r[content_col]))
        payload = buf.getvalue()
        ok = uploader(dmp_id, payload)
        return pd.DataFrame(
            {
                group_col: [dmp_id],
                "n_files": [len(pdf)],
                "zip_bytes_len": [len(payload)],
                "success": [ok],
            }
        )

    return groups.groupBy(group_col).applyInPandas(
        _upload,
        schema=f"{group_col} string, n_files long, zip_bytes_len long, success boolean",
    )
