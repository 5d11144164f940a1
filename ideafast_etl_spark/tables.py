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
def _nanos_ts_cols(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark can't read those
    natively; we read them as long and convert (truncating to micros, matching
    DuckDB/Arrow semantics)."""
    import pyarrow.dataset as ds
    import pyarrow.types as pt

    schema = ds.dataset(path, format="parquet").schema
    return tuple(
        f.name
        for f in schema
        if pt.is_timestamp(f.type) and f.type.unit == "ns"
    )


def load(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Read one synthetic table as a DataFrame."""
    d = sf_dir or DEFAULT_SF_DIR
    path = f"{d}/{name}.parquet"
    ns_cols = _nanos_ts_cols(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df


def load_all(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: load(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every table as a temp view so ``spark.sql`` queries work."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
