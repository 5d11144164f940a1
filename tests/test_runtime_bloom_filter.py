"""Runtime Bloom-filter join pruning: a selective dimension filter must be
propagated to the fact side as a row-level Bloom filter at RUNTIME
(`might_contain` on the fact scan side), killing non-matching fact rows
BEFORE the join shuffle.

The row-level counterpart of dynamic partition pruning (test_dpp.py): DPP
prunes whole partitions of a partitioned layout; the runtime Bloom filter
prunes rows of an unpartitioned scan — at 100 TB this is the difference
between shuffling the full fact table and shuffling only the ~matching
fraction when a dim filter is selective.

Engagement preconditions pinned here (the test_aqe_skew_join.py pattern —
prove the feature fires, and prove what blocks it):

1. the join must be a SHUFFLE join — a broadcast join already filters
   build-side-first, so Spark does not inject a Bloom filter into it;
2. `spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold`
   (default 10 GB) gates injection by application-side size: at production
   scale a dim-filtered fact join crosses it naturally; tests lower it to 0
   exactly as the harness-to-cluster threshold recipe in SCALE.md scales
   AQE's skew byte floors.
"""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def tables(spark, tmp_path):
    fact = spark.range(200_000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("tag")
    )
    fact.write.parquet(str(tmp_path / "fact"))
    dim.write.parquet(str(tmp_path / "dim"))
    return (
        spark.read.parquet(str(tmp_path / "fact")),
        spark.read.parquet(str(tmp_path / "dim")),
    )


def _with_confs(spark, confs):
    olds = {}
    for k, v in confs.items():
        try:
            olds[k] = spark.conf.get(k)
        except Exception:
            olds[k] = None
        spark.conf.set(k, v)
    return olds


def _restore(spark, olds):
    for k, v in olds.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_runtime_bloom_filter_fires_on_shuffle_join(spark, tables):
    fact, dim = tables
    olds = _with_confs(
        spark,
        {
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            # production default is 10 GB: harness data must scale it down,
            # the same geometry argument as the AQE skew thresholds
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold": "0",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    try:
        joined = fact.join(dim.filter(F.col("tag") == 3), "k")
        plan = _plan(joined)
        assert "might_contain" in plan, plan[:2000]
        assert "bloom_filter_agg" in plan, plan[:2000]
        # the filter prunes, it never decides: result is the exact join
        assert joined.count() == 143 * 200
    finally:
        _restore(spark, olds)


def test_broadcast_join_blocks_injection(spark, tables):
    """With broadcast allowed, the dim broadcasts and no Bloom filter is
    injected — the build side already filters before probing, so a Bloom
    filter would be pure overhead. Pinning the negative keeps the
    precondition visible: only shuffle joins benefit."""
    fact, dim = tables
    olds = _with_confs(
        spark,
        {
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold": "0",
        },
    )
    try:
        joined = fact.join(dim.filter(F.col("tag") == 3), "k")
        plan = _plan(joined)
        assert "BroadcastHashJoin" in plan
        assert "might_contain" not in plan
        assert joined.count() == 143 * 200
    finally:
        _restore(spark, olds)


def test_size_threshold_blocks_injection(spark, tables):
    """At the production default (10 GB application-side scan floor) the
    harness-sized fact is far below the threshold and injection correctly
    declines — the filter's build cost only pays for itself against a
    large scan."""
    fact, dim = tables
    olds = _with_confs(
        spark,
        {
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    try:
        joined = fact.join(dim.filter(F.col("tag") == 3), "k")
        assert "might_contain" not in _plan(joined)
    finally:
        _restore(spark, olds)
