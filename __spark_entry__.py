"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship ingest-dedup-enrich-group query (SURVEY.md §7.1).
``queries()`` / ``oracle_sql()`` — the operator inventory with DuckDB oracles;
implementations live in :mod:`ideafast_etl_spark.queries` / ``.oracles``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ideafast_etl_spark import queries as _queries
from ideafast_etl_spark import oracles as _oracles
from ideafast_etl_spark.functions.scalar import record_hash
from ideafast_etl_spark.operators.grouping import assign_group_id
from ideafast_etl_spark.operators.joins import dedup_against_state


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's semantic heart as one DataFrame chain —
    hash the incoming feed (X1), anti-join against already-seen state (J1),
    broadcast-enrich from a dimension (J2/J3), day-window bucket with the
    production 12:00 cut-off (G1), aggregate per upload group (G4/G5)."""
    from ideafast_etl_spark import tables

    sf_dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = tables.load(spark, "events", sf_dir)
    cust = tables.load(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", "c_nationkey"
    )

    incoming = ev.select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        record_hash(F.col("event_type"), F.col("event_id")).alias("hash"),
    )
    state = incoming.filter(F.col("event_id") % 7 == 0).select("hash")
    fresh = dedup_against_state(incoming, state)
    enriched = fresh.join(
        F.broadcast(cust), F.col("user_id") == F.col("c_custkey"), "left"
    ).select(
        "event_id",
        "ts",
        "hash",
        F.col("event_type").alias("device_id"),
        F.coalesce(F.col("c_name"), F.lit("unknown")).alias("patient_id"),
    )
    grouped = assign_group_id(enriched, cut_off="12:00:00", ts_col="ts")
    return grouped.groupBy("dmp_id").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.13."""
    return _queries.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (keys without an entry get the
    driver's weaker rows-only check)."""
    return dict(_oracles.ORACLES)
