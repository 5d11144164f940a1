"""Pure range join (no equi key) via time-bucketization.

A point-in-interval join with no equi key gives Catalyst nothing to hash on —
it plans BroadcastNestedLoopJoin (fine for small interval sets, quadratic
otherwise). The scale path: quantise time into fixed buckets, explode each
interval into the buckets it overlaps, bucket the points, equi-join on the
bucket id, then apply the exact range predicate. Join fan-out is bounded by
interval_span/bucket plus one, the shuffle key is the (uniform) bucket id,
and the result is exact — bucketization only prunes candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SECONDS_PER_DAY = 86_400


def _bucket_of(ts: Column, bucket_days: int) -> Column:
    return (F.unix_timestamp(ts) / F.lit(bucket_days * SECONDS_PER_DAY)).cast("long")


def range_join_point_in_interval(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_days: int = 7,
    how: str = "inner",
) -> DataFrame:
    """All (point, interval) pairs with start ≤ ts ≤ end. Output: point
    columns + interval columns. ``how='inner'`` (matching pairs only)."""
    assert how == "inner", "only inner supported; outer = left anti + union"
    b_lo = _bucket_of(F.col(start_col), bucket_days)
    b_hi = _bucket_of(F.col(end_col), bucket_days)
    exploded = intervals.withColumn(
        "_bucket", F.explode(F.sequence(b_lo, b_hi))
    )
    bucketed_points = points.withColumn("_bucket", _bucket_of(F.col(point_ts), bucket_days))
    return (
        bucketed_points.join(exploded, "_bucket")
        .filter(
            (F.col(start_col) <= F.col(point_ts))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("_bucket")
    )
