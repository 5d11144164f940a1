"""Catalog of the driver's synthetic parquet tables (TESTDATA.md).

All reads go through :func:`load` so column pruning / filter pushdown reach the
parquet scan (Catalyst does this automatically for ``spark.read.parquet`` —
verified via ``.explain``: ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import functools
import os
import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@functools.lru_cache(maxsize=256)
def _parquet_meta(path: str) -> tuple[tuple[str, ...], int, int]:
    """(nanos-timestamp columns, total rows, row groups) for a parquet path.

    Nanos columns need the long-read shim (Spark can't scan TIMESTAMP(NANOS));
    row-group count bounds scan parallelism — parquet only splits at row-group
    boundaries, so a big single-row-group file serialises its scan."""
    import pyarrow.dataset as ds
    import pyarrow.parquet as pq
    import pyarrow.types as pt

    dataset = ds.dataset(path, format="parquet")
    ns = tuple(
        f.name
        for f in dataset.schema
        if pt.is_timestamp(f.type) and f.type.unit == "ns"
    )
    rows = 0
    groups = 0
    for frag in dataset.get_fragments():
        md = pq.ParquetFile(frag.path).metadata
        rows += md.num_rows
        groups += md.num_row_groups
    return ns, rows, groups


# Engine contract, pinned at session construction (session.py). The UTC
# timezone keeps LTZ wall-clock values aligned with the (tz-naive) DuckDB
# oracle; inferTimestampNTZ=false makes the parquet SCAN read tz-naive
# timestamp columns directly as TIMESTAMP (LTZ) — the canonical type —
# instead of TIMESTAMP_NTZ + a per-row cast on every event-time query
# (the round-4 bench regression: the cast cost 8-22% warm on the
# events/orders/lineitem hot path).
_PINNED_CONFS = (
    ("spark.sql.session.timeZone", "UTC"),
    ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
)

_WARNED_SESSIONS: set[int] = set()


def _pin_session(spark: SparkSession, need_nanos_shim: bool) -> None:
    """Ensure the session carries the engine's conf contract.

    Sessions built by :func:`ideafast_etl_spark.session.get_spark` already
    satisfy it, so this is read-only for them (no side effects on the
    caller's conf — a library must not silently flip session switches).
    A FOREIGN session (e.g. the differential-oracle driver's) that
    deviates is pinned, with a one-time warning naming what changed."""
    changed = []
    confs = list(_PINNED_CONFS)
    if need_nanos_shim:
        confs.append(("spark.sql.legacy.parquet.nanosAsLong", "true"))
    for k, v in confs:
        try:
            cur = spark.conf.get(k)
        except Exception:
            cur = None
        if cur != v:
            spark.conf.set(k, v)
            changed.append(k)
    if changed and id(spark) not in _WARNED_SESSIONS:
        _WARNED_SESSIONS.add(id(spark))
        warnings.warn(
            "tables.load pinned session conf to the engine contract: "
            + ", ".join(changed)
            + " (build sessions with ideafast_etl_spark.session.get_spark "
            "to avoid this mutation)",
            stacklevel=3,
        )


def load(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Read one synthetic table as a DataFrame.

    The resolved DataFrame is cached per (session, path): DataFrames are
    immutable plan handles, so reuse is safe, and repeated ``_t()`` calls
    inside one bench/pipeline run skip the parquet-footer probe, conf
    checks, and analysis chain (plan-compile cost showed up in every cold
    bench number).

    Fact-sized tables stored as a handful of row groups get an explicit
    repartition to cluster parallelism: the scan itself can't split further,
    but everything downstream (partial aggregation, hash joins, per-row hash
    work) then runs on all cores instead of one. Catalyst still pushes filters
    below the exchange, and an explicit-N repartition is exempt from AQE
    coalescing. At real scale the file layout provides the parallelism and
    this is a no-op (row groups ≥ cores)."""
    d = sf_dir or DEFAULT_SF_DIR
    path = os.path.abspath(f"{d}/{name}.parquet")
    cache: dict[str, DataFrame] = spark.__dict__.setdefault(
        "_spark_graft_table_cache", {}
    )
    cached = cache.get(path)
    if cached is not None:
        return cached
    # Foreign sessions (the oracle driver's) don't have this repo on their
    # executors' PYTHONPATH; ship the package so Arrow-UDF closures that
    # reference package modules unpickle on the workers.
    from .shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    ns_cols, rows, groups = _parquet_meta(path)
    _pin_session(spark, need_nanos_shim=bool(ns_cols))
    df = spark.read.parquet(path)
    # The shim is type-driven, not metadata-driven: plain TIMESTAMP(NANOS)
    # files scan as LONG under nanosAsLong (truncate to micros here, matching
    # DuckDB), but Spark reads nanos files IT wrote (row-metadata present)
    # natively as timestamps — those need no conversion.
    from pyspark.sql.types import LongType, TimestampNTZType

    for c in ns_cols:
        if isinstance(df.schema[c].dataType, LongType):
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    # Canonical timestamp contract: every query sees TIMESTAMP (LTZ, UTC
    # session). With inferTimestampNTZ=false the scan already yields LTZ for
    # tz-naive fixtures, so this loop is normally a no-op — it remains as a
    # safety net for any path that still surfaces NTZ (NTZ breaks
    # unix_micros & friends with DATATYPE_MISMATCH).
    for f in df.schema.fields:
        if isinstance(f.dataType, TimestampNTZType):
            df = df.withColumn(f.name, F.to_timestamp(F.col(f.name)))
    parallelism = spark.sparkContext.defaultParallelism
    if rows >= 50_000 and groups < max(2, parallelism // 4):
        df = df.repartition(parallelism)
    cache[path] = df
    return df


def load_all(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: load(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every table as a temp view so ``spark.sql`` queries work."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
