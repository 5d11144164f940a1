"""As-of join: backward-inclusive semantics, tie-breaks, and atomic payload
(all payload columns from the SAME right row even when fields are NULL)."""

from datetime import datetime

from ideafast_etl_spark.operators.asof import asof_join


def _dt(s):
    return datetime.fromisoformat(s)


def test_asof_backward_inclusive_and_no_match(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", _dt("2024-01-10T00:00:00")),
            (2, "k1", _dt("2024-01-05T00:00:00")),  # exactly at right ts → inclusive
            (3, "k1", _dt("2024-01-01T00:00:00")),  # before everything → NULL
            (4, "k2", _dt("2024-01-10T00:00:00")),  # key with no right rows
        ],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k1", _dt("2024-01-05T00:00:00"), 100, "a"),
            ("k1", _dt("2024-01-08T00:00:00"), 200, "b"),
        ],
        "k string, rts timestamp, val long, tag string",
    )
    out = {r["id"]: (r["val"], r["tag"]) for r in asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        payload_cols=("val", "tag"), tie_break="val",
    ).collect()}
    assert out[1] == (200, "b")
    assert out[2] == (100, "a")  # at-or-before is inclusive
    assert out[3] == (None, None)
    assert out[4] == (None, None)


def test_asof_payload_is_atomic_across_null_fields(spark):
    # the newest right row has a NULL field; a naive per-column forward-fill
    # would steal that field from an older row — must not happen
    left = spark.createDataFrame(
        [(1, "k", _dt("2024-01-10T00:00:00"))], "id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            ("k", _dt("2024-01-02T00:00:00"), 7, "old"),
            ("k", _dt("2024-01-08T00:00:00"), None, "new"),
        ],
        "k string, rts timestamp, val long, tag string",
    )
    row = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        payload_cols=("val", "tag"), tie_break="tag",
    ).first()
    assert (row["val"], row["tag"]) == (None, "new")


def test_asof_same_instant_tie_break_max_wins(spark):
    left = spark.createDataFrame(
        [(1, "k", _dt("2024-01-10T00:00:00"))], "id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            ("k", _dt("2024-01-05T00:00:00"), 1, "low"),
            ("k", _dt("2024-01-05T00:00:00"), 9, "high"),
        ],
        "k string, rts timestamp, val long, tag string",
    )
    row = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        payload_cols=("val", "tag"), tie_break="val",
    ).first()
    assert (row["val"], row["tag"]) == (9, "high")


def test_asof_bucketed_parity_stitch_topologies(spark):
    # r8 bucketed twin: the same cases that trip LOCF stitches — payload
    # carried across one boundary, across an empty bucket, a right row
    # landing in the same bucket as the left row, and no-match keys
    left = spark.createDataFrame(
        [
            (1, "k1", _dt("2024-01-10T12:00:00")),  # carried across days
            (2, "k1", _dt("2024-01-05T09:00:00")),  # same-bucket right row
            (3, "k1", _dt("2024-01-01T00:00:00")),  # before everything
            (4, "k2", _dt("2024-01-10T00:00:00")),  # key with no right rows
            (5, "k1", _dt("2024-01-20T00:00:00")),  # across many empty days
        ],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k1", _dt("2024-01-05T08:00:00"), 100, "a"),
            ("k1", _dt("2024-01-08T00:00:00"), 200, "b"),
        ],
        "k string, rts timestamp, val long, tag string",
    )
    kw = dict(
        on="k", left_ts="ts", right_ts="rts",
        payload_cols=("val", "tag"), tie_break="val",
    )
    plain = sorted(map(tuple, asof_join(left, right, **kw).collect()))
    bkt = sorted(
        map(tuple, asof_join(left, right, bucket="1 day", **kw).collect())
    )
    assert bkt == plain
    out = {t[0]: (t[3], t[4]) for t in bkt}
    assert out[1] == (200, "b") and out[2] == (100, "a")
    assert out[3] == (None, None) and out[4] == (None, None)
    assert out[5] == (200, "b")


def test_asof_bucketed_fuzz_hot_key(spark):
    import random

    rng = random.Random(77)
    lrows, rrows = [], []
    i = 0
    for _ in range(1500):
        k = "hot" if rng.random() < 0.3 else f"k{rng.randint(0, 20)}"
        ts = _dt("2024-01-01T00:00:00").timestamp() + rng.uniform(
            0, 20 * 86400
        )
        if rng.random() < 0.5:
            lrows.append((i, k, datetime.fromtimestamp(ts)))
        else:
            rrows.append((k, datetime.fromtimestamp(ts), rng.randint(1, 9)))
        i += 1
    left = spark.createDataFrame(lrows, "id long, k string, ts timestamp")
    right = spark.createDataFrame(rrows, "k string, rts timestamp, val long")
    kw = dict(
        on="k", left_ts="ts", right_ts="rts",
        payload_cols=("val",), tie_break="val",
    )
    plain = sorted(map(tuple, asof_join(left, right, **kw).collect()))
    bkt = sorted(
        map(tuple, asof_join(left, right, bucket="1 day", **kw).collect())
    )
    assert bkt == plain and len(plain) == len(lrows)
