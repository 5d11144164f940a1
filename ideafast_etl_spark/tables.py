"""Catalog of the driver's synthetic parquet tables (TESTDATA.md).

All reads go through :func:`load` so column pruning / filter pushdown reach the
parquet scan (Catalyst does this automatically for ``spark.read.parquet`` —
verified via ``.explain``: ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import functools
import os

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


def load(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Read one synthetic table as a DataFrame.

    Fact-sized tables stored as a handful of row groups get an explicit
    repartition to cluster parallelism: the scan itself can't split further,
    but everything downstream (partial aggregation, hash joins, per-row hash
    work) then runs on all cores instead of one. Catalyst still pushes filters
    below the exchange, and an explicit-N repartition is exempt from AQE
    coalescing. At real scale the file layout provides the parallelism and
    this is a no-op (row groups ≥ cores)."""
    d = sf_dir or DEFAULT_SF_DIR
    path = f"{d}/{name}.parquet"
    # Pin UTC regardless of the caller's session: LTZ timestamps (e.g. the
    # nanos→micros conversion below) and date_trunc would otherwise shift
    # with the host timezone, diverging from the (tz-naive) SQL oracle.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Foreign sessions (the oracle driver's) don't have this repo on their
    # executors' PYTHONPATH; ship the package so Arrow-UDF closures that
    # reference package modules unpickle on the workers.
    from .shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    ns_cols, rows, groups = _parquet_meta(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
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
    # session). Fixture regenerations have flipped between nanos (→ LTZ via
    # the shim above) and micros-NTZ encodings; NTZ breaks unix_micros &
    # friends (DATATYPE_MISMATCH), so normalise it here — under the pinned
    # UTC session the wall-clock values are identical, and no query ever
    # sees the drift. One normalisation point instead of N query fixes.
    for f in df.schema.fields:
        if isinstance(f.dataType, TimestampNTZType):
            df = df.withColumn(f.name, F.to_timestamp(F.col(f.name)))
    parallelism = spark.sparkContext.defaultParallelism
    if rows >= 50_000 and groups < max(2, parallelism // 4):
        df = df.repartition(parallelism)
    return df


def load_all(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: load(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every table as a temp view so ``spark.sql`` queries work."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
