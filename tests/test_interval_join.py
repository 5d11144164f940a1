"""J4 interval-containment boundary cases, ported from the reference's
parametrised tests (tests/hooks/test_ucam_hook.py:81-110; fixture shape
tests/hooks/conftest.py:85-118): patients B [11-04, 11-06], C [11-06, 11-07],
A [11-10, open) on one device."""

from datetime import datetime

import pytest

from ideafast_etl_spark.operators.joins import interval_containment_join


def _dt(s):
    return datetime.fromisoformat(s)


ASSIGNMENTS = [
    ("NR1-DEVICE", "B-PATIENT", _dt("2021-11-04T00:00:00"), _dt("2021-11-06T23:59:59")),
    ("NR1-DEVICE", "C-PATIENT", _dt("2021-11-06T00:00:00"), _dt("2021-11-07T23:59:59")),
    ("NR1-DEVICE", "A-PATIENT", _dt("2021-11-10T00:00:00"), None),
]


@pytest.fixture(scope="module")
def assignments(spark):
    return spark.createDataFrame(
        ASSIGNMENTS, ["device_id", "patient_id", "start_wear", "end_wear"]
    )


def _run(spark, assignments, start, end):
    records = spark.createDataFrame(
        [("r1", "NR1-DEVICE", _dt(start), _dt(end))],
        ["hash", "device_id", "start", "end"],
    )
    out = interval_containment_join(
        records,
        assignments,
        order_cols=("start_wear", "patient_id"),
    ).collect()
    assert len(out) == 1
    return out[0]["patient_id"]


def test_recording_within_period(spark, assignments):
    assert _run(spark, assignments, "2021-11-05T09:00:00", "2021-11-05T11:00:00") == "B-PATIENT"


def test_evening_recording_day_normalised(spark, assignments):
    # day-normalisation means a 23:00 recording on the last wear day matches
    # (ucam.py:95-105)
    assert _run(spark, assignments, "2021-11-06T23:00:00", "2021-11-06T23:30:00") == "B-PATIENT"


def test_open_ended_period(spark, assignments):
    # end_wear NULL ⇒ today (ucam.py:129)
    assert _run(spark, assignments, "2021-11-12T10:00:00", "2021-11-12T12:00:00") == "A-PATIENT"


def test_before_all_periods_no_match(spark, assignments):
    assert _run(spark, assignments, "2021-11-01T10:00:00", "2021-11-01T12:00:00") is None


def test_straddling_period_start_no_match(spark, assignments):
    # starts before B's window, ends inside → must NOT match
    assert _run(spark, assignments, "2021-11-03T23:00:00", "2021-11-04T01:00:00") is None


def test_straddling_period_end_no_match(spark, assignments):
    # starts inside C's window, ends after → must NOT match (gap 11-08..11-09)
    assert _run(spark, assignments, "2021-11-07T23:00:00", "2021-11-08T01:00:00") is None


def test_first_match_tie_break_deterministic(spark, assignments):
    # 2021-11-06 is covered by BOTH B and C (adjacent/overlapping on the day);
    # earliest start_wear wins → B (divergence decision SURVEY.md §7.4.1)
    assert _run(spark, assignments, "2021-11-06T08:00:00", "2021-11-06T09:00:00") == "B-PATIENT"


def test_unmatched_record_keeps_all_columns(spark, assignments):
    records = spark.createDataFrame(
        [("r1", "OTHER-DEVICE", _dt("2021-11-05T09:00:00"), _dt("2021-11-05T11:00:00"))],
        ["hash", "device_id", "start", "end"],
    )
    out = interval_containment_join(records, assignments).collect()
    assert len(out) == 1
    assert out[0]["hash"] == "r1"
    assert out[0]["patient_id"] is None
