"""Proof that AQE's skew-join split actually FIRES in this engine's session
configuration (session.py enables spark.sql.adaptive.skewJoin) — not just
that the flag is set. A planted hot key must produce `skew=true` in the
post-execution adaptive plan.

Why thresholds are lowered here: AQE marks a partition skewed only when it
exceeds BOTH `skewedPartitionFactor` (default 5.0) x the median partition
size AND `skewedPartitionThresholdInBytes` (default 256 MB). Unit-test data
can't reach 256 MB, so the test scales the byte thresholds down; the FACTOR
criterion — the one that encodes "this partition is pathological relative
to its peers" — is exercised for real. The production recipe is in SCALE.md
(§ AQE skew-join), including the two engagement preconditions these tests
pin down:

  1. broadcast must be off the table for the join (a broadcast join has no
     skewed shuffle to split), and
  2. no downstream operator may REQUIRE the join's hash partitioning —
     a groupBy on the join key blocks the split (splitting would break the
     required distribution) unless forceOptimizeSkewedJoin accepts the
     extra shuffle.
"""

import pytest
from pyspark.sql import functions as F

# runtime SQL confs scaled to unit-test data volume; production recipe in
# SCALE.md uses the same knobs at MB/GB magnitudes
_SKEW_CONF = {
    # no broadcast: skew split applies to sort-merge/shuffled-hash joins
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
}


@pytest.fixture()
def skew_conf(spark):
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONF}
    for k, v in _SKEW_CONF.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _planted_join(spark):
    # left: one pathological hot key (0) carrying ~97% of rows, plus a
    # uniform tail; right: two rows per key, broadcast disabled by conf
    left = spark.range(300_000).select(
        F.when(F.col("id") % 30 != 0, F.lit(0))
        .otherwise((F.col("id") % 96) + 1)  # tail keys 1..96: never the hot 0
        .alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(0, 97).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dim")
    )
    right = right.unionByName(right.withColumn("dim", F.col("dim") + 1))
    return left.join(right, "k")


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_splits_planted_skewed_join(spark, skew_conf):
    # global aggregate downstream: no required distribution above the
    # join, so the skew split is admissible
    joined = _planted_join(spark).agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
    )
    (row,) = joined.collect()
    assert row["n"] == 290_000 * 2 + 10_000 * 2  # split didn't change results

    plan = _executed_plan(joined)
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, plan[:4000]


def test_group_on_join_key_blocks_split_unless_forced(spark, skew_conf):
    """A keyed aggregate on the JOIN key requires the join's hash
    partitioning, so AQE must decline the split (it would force a
    re-shuffle) — until forceOptimizeSkewedJoin explicitly accepts that
    trade. Both behaviours are the documented contract."""
    agg = lambda: _planted_join(spark).groupBy("k").agg(  # noqa: E731
        F.count(F.lit(1)).alias("n")
    )
    j1 = agg()
    j1.collect()
    assert "skew=true" not in _executed_plan(j1)

    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    try:
        j2 = agg()
        rows = {r["k"]: r["n"] for r in j2.collect()}
        assert rows[0] == 290_000 * 2
        assert "skew=true" in _executed_plan(j2)
    finally:
        spark.conf.unset("spark.sql.adaptive.forceOptimizeSkewedJoin")


def test_no_skew_no_split(spark, skew_conf):
    """Uniform keys under the same thresholds must NOT trigger the skew
    path — the assertion above is about the planted pathology, not a
    config that blanket-splits everything."""
    left = spark.range(300_000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("payload")
    )
    right = spark.range(0, 97).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dim")
    )
    joined = left.join(right, "k").agg(F.count(F.lit(1)).alias("n"))
    joined.collect()
    assert "skew=true" not in _executed_plan(joined)
