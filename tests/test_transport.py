"""Transport retry/timeout contract (reference dmp.py:126-136): bounded
retries with exponential backoff; sources raise on exhaustion, upload sinks
absorb failures into success=False (at-least-once loop feed)."""

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ideafast_etl_spark.sinks.upload import upload_groups
from ideafast_etl_spark.sources.rest import PaginatedRestSource
from ideafast_etl_spark.sources.transport import RetryPolicy, retrying


def test_policy_carries_reference_timeout_tuple():
    assert RetryPolicy().timeouts == (4.0, 302.0)


def test_retrying_recovers_after_transient_failures():
    sleeps: list[float] = []
    attempts = {"n": 0}

    def flaky():
        attempts["n"] += 1
        if attempts["n"] <= 2:
            raise TimeoutError("transient")
        return "ok"

    wrapped = retrying(
        flaky, RetryPolicy(max_attempts=3, backoff_base=0.5), sleep=sleeps.append
    )
    assert wrapped() == "ok"
    assert attempts["n"] == 3
    assert sleeps == [0.5, 1.0]  # exponential backoff between attempts


def test_retrying_raises_on_exhaustion_and_respects_cap():
    sleeps: list[float] = []

    def always_down():
        raise ConnectionError("down")

    wrapped = retrying(
        always_down,
        RetryPolicy(max_attempts=4, backoff_base=20.0, backoff_cap=30.0),
        sleep=sleeps.append,
    )
    with pytest.raises(ConnectionError):
        wrapped()
    assert sleeps == [20.0, 30.0, 30.0]  # capped, no sleep after final try


def test_retrying_absorb_returns_fallback():
    wrapped = retrying(
        lambda: (_ for _ in ()).throw(TimeoutError("x")),
        RetryPolicy(max_attempts=2, backoff_base=0.0),
        absorb=lambda _e: False,
        sleep=lambda _s: None,
    )
    assert wrapped() is False


def test_non_retryable_exception_propagates_immediately():
    attempts = {"n": 0}

    def bad():
        attempts["n"] += 1
        raise ValueError("not transport")

    wrapped = retrying(bad, RetryPolicy(max_attempts=5), sleep=lambda _s: None)
    with pytest.raises(ValueError):
        wrapped()
    assert attempts["n"] == 1


def test_rest_source_retries_flaky_pages(spark):
    schema = StructType([StructField("id", StringType())])
    state = {"fails": 0}

    def flaky_fetch(cursor):
        # first call to every page times out once, then succeeds
        if state["fails"] % 2 == 0:
            state["fails"] += 1
            raise TimeoutError("transient page failure")
        state["fails"] += 1
        start = int(cursor) if cursor else 0
        rows = [{"id": f"r{i}"} for i in range(start, start + 3)]
        return rows, str(start + 3) if start + 3 < 9 else None

    src = PaginatedRestSource(
        flaky_fetch, schema, retry=RetryPolicy(max_attempts=2, backoff_base=0.0)
    )
    assert src.load(spark).count() == 9


def test_rest_source_raises_when_page_stays_down(spark):
    schema = StructType([StructField("id", StringType())])

    def dead_fetch(cursor):
        raise ConnectionError("api down")

    src = PaginatedRestSource(
        dead_fetch, schema, retry=RetryPolicy(max_attempts=3, backoff_base=0.0)
    )
    with pytest.raises(ConnectionError):
        src.load(spark)


def test_upload_retry_absorbs_exhaustion_executor_side(spark):
    groups = spark.createDataFrame(
        [("G-FLAKY", 1), ("G-DEAD", 2), ("G-OK", 3)], ["dmp_id", "x"]
    )
    # per-task attempt counters persist across the retry loop inside one call
    attempts: dict[str, int] = {}

    def transport(dmp_id, payload) -> bool:
        n = attempts.get(dmp_id, 0) + 1
        attempts[dmp_id] = n
        if dmp_id == "G-DEAD":
            raise TimeoutError("always down")
        if dmp_id == "G-FLAKY" and n == 1:
            raise TimeoutError("first try down")
        return True

    out = {
        r["dmp_id"]: r["success"]
        for r in upload_groups(
            groups,
            transport,
            retry=RetryPolicy(max_attempts=2, backoff_base=0.0),
        ).collect()
    }
    # flaky group recovered on retry; dead group absorbed into False (the
    # at-least-once loop re-selects it next run); job never raised
    assert out == {"G-FLAKY": True, "G-DEAD": False, "G-OK": True}
