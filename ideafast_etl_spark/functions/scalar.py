"""Scalar functions (SURVEY.md §2.10, X1-X8) as Column expressions.

Everything here is built-in ``pyspark.sql.functions`` composition — JVM-side,
inside whole-stage codegen; no Python UDFs. Reference citations are to
/root/reference (behavioral parity only; implementation is Spark-native).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def record_hash(device_type: Column | str, ref: Column | str) -> Column:
    """X1 — the dedup identity: sha256 over device-type name ‖ vendor ref,
    concatenated with no separator (reference: ideafast_etl/hooks/db.py:49-55
    feeds two ``update()`` calls into one digest, which is equivalent to
    hashing the concatenation).
    """
    dt = F.col(device_type) if isinstance(device_type, str) else device_type
    r = F.col(ref) if isinstance(ref, str) else ref
    return F.sha2(F.concat(dt.cast("string"), r.cast("string")), 256)


def parse_weartime(col: Column | str) -> Column:
    """X2 — parse ``%Y-%m-%dT%H:%M:%S`` strings (ideafast_etl/hooks/ucam.py:58-61)."""
    return F.to_timestamp(col, "yyyy-MM-dd'T'HH:mm:ss")


def normalise_day(col: Column | str) -> Column:
    """X3 — zero out time-of-day (ideafast_etl/hooks/ucam.py:190-193)."""
    return F.date_trunc("DAY", col)


def weartime_in_ms(col: Column | str) -> Column:
    """X4 — ``'20210101'`` → epoch millis (ideafast_etl/hooks/dmp.py:179-182)."""
    return F.unix_millis(F.to_timestamp(col, "yyyyMMdd"))


def epoch_seconds_to_ts(col: Column | str) -> Column:
    """X5 — epoch seconds → timestamp. The reference uses local-tz
    ``datetime.fromtimestamp`` (dags/dreem.py:58-59); we pin UTC via the
    session timezone (intentional divergence, SURVEY.md §7.4)."""
    return F.timestamp_seconds(col)


def compact_day(col: Column | str) -> Column:
    """X6 — date → ``yyyyMMdd`` string (ideafast_etl/operators/ucam.py:123)."""
    return F.date_format(col, "yyyyMMdd")


def strip_hyphens(col: Column | str) -> Column:
    """X7 — remove hyphens from ids (ideafast_etl/operators/ucam.py:122)."""
    return F.regexp_replace(col, "-", "")


def json_dot_path(col: Column | str, path: str) -> Column:
    """X8 — dot-path JSON extraction ``a.b.[1].c`` (ideafast_etl/hooks/jwt.py:59-85).

    The reference's path grammar uses ``[n]`` segments for list indices; we
    translate to JSONPath for ``get_json_object`` (null-safe traversal, same
    observable semantics minus the KeyError on absence — Spark returns NULL).
    """
    parts = [p for p in path.split(".") if p]
    jp = "$"
    for p in parts:
        if p.startswith("[") and p.endswith("]"):
            jp += p
        else:
            jp += "." + p
    return F.get_json_object(col, jp)


def group_key(
    device_id: Column | str,
    patient_id: Column | str,
    bucket_start: Column | str,
    bucket_end: Column | str,
) -> Column:
    """The ``DEVICEID-PATIENTID-YYYYMMDD-YYYYMMDD`` upload-group key
    (ideafast_etl/operators/ucam.py:121-124): hyphens stripped from ids,
    compact dates for the window bounds."""
    return F.concat_ws(
        "-",
        strip_hyphens(device_id),
        strip_hyphens(patient_id),
        compact_day(bucket_start),
        compact_day(bucket_end),
    )
