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


def test_dominated_assignment_prune_preserves_semantics(spark):
    """r8 degenerate-key guard: an assignment whose day-span is covered by
    an earlier-ordered assignment can never be the first match — pruning
    it pre-join must not change any result. Planted: D2 is fully covered
    by D1 (earlier start, later end); a record inside D2's span must
    still resolve to D1, and a record only D3 (not covered) contains must
    resolve to D3."""
    asg = spark.createDataFrame(
        [
            ("DEV", "P1", _dt("2021-11-01T00:00:00"), _dt("2021-11-20T00:00:00")),
            ("DEV", "P2", _dt("2021-11-05T00:00:00"), _dt("2021-11-10T00:00:00")),  # covered by P1
            ("DEV", "P3", _dt("2021-11-18T00:00:00"), _dt("2021-11-30T00:00:00")),  # extends past P1
        ],
        ["device_id", "patient_id", "start_wear", "end_wear"],
    )
    rec = spark.createDataFrame(
        [
            ("r1", "DEV", _dt("2021-11-06T09:00:00"), _dt("2021-11-06T10:00:00")),
            ("r2", "DEV", _dt("2021-11-25T09:00:00"), _dt("2021-11-25T10:00:00")),
        ],
        ["hash", "device_id", "start", "end"],
    )
    out = {
        r["hash"]: r["patient_id"]
        for r in interval_containment_join(
            rec, asg, order_cols=("start_wear", "patient_id")
        ).collect()
    }
    assert out == {"r1": "P1", "r2": "P3"}


def test_equal_interval_fanout_collapses_to_one_survivor(spark):
    """The planted skew pathology: many identical-span assignments on one
    hot device. All but the order_cols-minimal one are dominated, so the
    join probes ONE assignment instead of n — and the winner is exactly
    the tie-break minimum the unpruned operator would pick."""
    from pyspark.sql import functions as F

    asg = spark.range(500).select(
        F.lit("HOT").alias("device_id"),
        F.concat(F.lit("P"), F.format_string("%03d", F.col("id"))).alias(
            "patient_id"
        ),
        F.lit(_dt("2021-11-01T00:00:00")).alias("start_wear"),
        F.lit(_dt("2021-12-01T00:00:00")).alias("end_wear"),
    )
    rec = spark.createDataFrame(
        [("r1", "HOT", _dt("2021-11-15T09:00:00"), _dt("2021-11-15T10:00:00"))],
        ["hash", "device_id", "start", "end"],
    )
    out = interval_containment_join(
        rec, asg, order_cols=("start_wear", "patient_id")
    ).collect()
    assert len(out) == 1 and out[0]["patient_id"] == "P000"


def test_prune_skipped_when_order_not_led_by_start(spark, assignments):
    """Soundness gate: when order_cols doesn't lead with the interval
    start, domination can't be inferred from a running max — the operator
    must skip the prune and still produce the order_cols-minimal match."""
    rec = spark.createDataFrame(
        [("r1", "NR1-DEVICE", _dt("2021-11-06T08:00:00"), _dt("2021-11-06T09:00:00"))],
        ["hash", "device_id", "start", "end"],
    )
    out = interval_containment_join(
        rec, assignments, order_cols=("patient_id",)
    ).collect()
    # 11-06 is in both B and C; min patient_id = B-PATIENT
    assert out[0]["patient_id"] == "B-PATIENT"


@pytest.mark.parametrize("bucket_days", [1, 7])
def test_bucketed_boundary_cases_match_single_window(
    spark, assignments, bucket_days
):
    """r9 skew-proof twin: every boundary case resolves identically with
    the (device, day-bucket) decomposition — including matches that must
    cross a bucket boundary via the carry-in survivor."""
    cases = [
        ("2021-11-05T09:00:00", "2021-11-05T11:00:00", "B-PATIENT"),
        ("2021-11-06T23:00:00", "2021-11-06T23:30:00", "B-PATIENT"),
        ("2021-11-12T10:00:00", "2021-11-12T12:00:00", "A-PATIENT"),
        ("2021-11-01T10:00:00", "2021-11-01T12:00:00", None),
        ("2021-11-03T23:00:00", "2021-11-04T01:00:00", None),
        ("2021-11-07T23:00:00", "2021-11-08T01:00:00", None),
        ("2021-11-06T08:00:00", "2021-11-06T09:00:00", "B-PATIENT"),
    ]
    records = spark.createDataFrame(
        [
            (f"r{i}", "NR1-DEVICE", _dt(s), _dt(e))
            for i, (s, e, _) in enumerate(cases)
        ],
        ["hash", "device_id", "start", "end"],
    )
    out = {
        r["hash"]: r["patient_id"]
        for r in interval_containment_join(
            records,
            assignments,
            order_cols=("start_wear", "patient_id"),
            bucket_days=bucket_days,
        ).collect()
    }
    assert out == {f"r{i}": want for i, (_, _, want) in enumerate(cases)}


def test_bucketed_parity_fuzz_with_hot_device(spark):
    """Strategy-parity fuzz: random intervals with 30 % of records AND
    assignments on one hot device — bucketed output must be row-identical
    to the single-window merge scan and to the join strategy, for several
    bucket widths (including one so wide everything shares a bucket and
    one so narrow every day is its own)."""
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.default_rng(99)
    n_rec, n_asg = 400, 120
    devs = [
        "HOT" if rng.random() < 0.3 else f"D{rng.integers(0, 20)}"
        for _ in range(n_rec)
    ]
    base = _dt("2021-01-01T00:00:00")
    from datetime import timedelta

    recs = []
    for i, d in enumerate(devs):
        s = base + timedelta(days=int(rng.integers(0, 120)), hours=int(rng.integers(0, 24)))
        e = s + timedelta(hours=int(rng.integers(0, 72)))
        recs.append((f"r{i}", d, s, e))
    # a few null-endpoint records (never match, must survive as NULL rows)
    recs.append(("rnull", "HOT", None, base))
    recs.append(("rnull2", "D1", base, None))
    asgs = []
    for i in range(n_asg):
        d = "HOT" if rng.random() < 0.3 else f"D{rng.integers(0, 20)}"
        s = base + timedelta(days=int(rng.integers(0, 120)))
        e = (
            None
            if rng.random() < 0.1
            else s + timedelta(days=int(rng.integers(1, 40)))
        )
        asgs.append((d, f"P{i:03d}", s, e))
    records = spark.createDataFrame(
        recs, "hash string, device_id string, start timestamp, end timestamp"
    )
    assignments = spark.createDataFrame(
        asgs,
        "device_id string, patient_id string, "
        "start_wear timestamp, end_wear timestamp",
    )

    def run(**kw):
        return sorted(
            (r["hash"], r["patient_id"])
            for r in interval_containment_join(
                records,
                assignments,
                order_cols=("start_wear", "patient_id"),
                **kw,
            ).collect()
        )

    want = run(strategy="join")
    assert run() == want  # single-window merge scan
    for bd in (1, 7, 30, 100000):
        assert run(bucket_days=bd) == want, f"bucket_days={bd}"
    # bucketed prune + join strategy (prune decomposition alone)
    assert run(strategy="join", bucket_days=7) == want
