"""G1 day-window grouping boundaries, ported from
tests/operators/test_ucam_operator.py:63-167."""

from datetime import datetime

import pytest

from ideafast_etl_spark.operators.grouping import assign_group_id


def _group(spark, ts, cut_off):
    df = spark.createDataFrame(
        [("h1", "NR1-DEVICE", "A-PATIENT", datetime.fromisoformat(ts))],
        ["hash", "device_id", "patient_id", "start"],
    )
    row = assign_group_id(df, cut_off=cut_off).first()
    return row["dmp_id"]


# --- midnight mode: window start = end = record's own day -------------------


@pytest.mark.parametrize(
    "ts",
    ["2021-12-13T00:00:00", "2021-12-13T00:00:01", "2021-12-13T23:59:59"],
)
def test_midnight_mode_same_day_window(spark, ts):
    assert _group(spark, ts, "00:00:00") == "NR1DEVICE-APATIENT-20211213-20211213"


# --- cut-off mode: before cut-off → [yesterday, today]; at/after → [today, tomorrow]


def test_just_before_cutoff(spark):
    assert (
        _group(spark, "2021-12-13T08:59:59", "09:00:00")
        == "NR1DEVICE-APATIENT-20211212-20211213"
    )


def test_exactly_at_cutoff(spark):
    assert (
        _group(spark, "2021-12-13T09:00:00", "09:00:00")
        == "NR1DEVICE-APATIENT-20211213-20211214"
    )


def test_just_after_cutoff(spark):
    assert (
        _group(spark, "2021-12-13T09:00:01", "09:00:00")
        == "NR1DEVICE-APATIENT-20211213-20211214"
    )


def test_production_noon_cutoff(spark):
    # dreem DAG uses 12:00:00 (dags/dreem.py:276-281)
    assert (
        _group(spark, "2021-12-13T11:59:59", "12:00:00")
        == "NR1DEVICE-APATIENT-20211212-20211213"
    )


@pytest.mark.parametrize("bad", ["9:00", "24:00:00", "xx:yy:zz", ""])
def test_invalid_cutoff_rejected(spark, bad):
    # operators/ucam.py:94-98 raises ValueError on bad format
    with pytest.raises(ValueError):
        _group(spark, "2021-12-13T09:00:00", bad)
