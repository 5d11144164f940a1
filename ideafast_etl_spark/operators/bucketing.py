"""Bucketed-table co-located joins: the shuffle-elimination layout for
repeated large-×-large joins.

A join between two fact tables both hash-bucketed into the same number of
buckets on their join keys needs NO exchange at read time — each task joins
bucket i of one table against bucket i of the other. At 100 TB this converts
the single most expensive repeated operation (a multi-TB shuffle per join)
into a one-time layout cost at write time, exactly like pre-partitioning the
state store converts merges into partition-local work.

``sortBy`` within buckets additionally lets sort-merge join skip its sort
when each bucket holds one file (post-compaction), making the join a pure
streaming merge. This module is the batch-layout counterpart of
operators/layout.py (Z-order: scan pruning) — this one optimizes joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) table. Bucketing
    metadata lives in the catalog, so only ``saveAsTable`` can carry it —
    plain ``parquet(path)`` writes would lose the layout contract."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket keys. With both
    sides bucketed into the same bucket count this plans as a sort-merge
    join with ZERO Exchange operators (asserted in tests/test_bucketing.py)
    — bucket i joins bucket i, no shuffle."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])
