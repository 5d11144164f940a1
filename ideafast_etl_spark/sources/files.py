"""File-based sources: CSV dimension tables and binary assets
(SURVEY.md §2.1 S5 + §2.13 multimodal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_csv_dim(
    spark: SparkSession, path: str, schema: str, header: bool = True
) -> DataFrame:
    """S5 — 2-column CSV lookup dim (reference loads these into an lru-cached
    dict, ucam.py:138-153). Here: a plain DataFrame the caller broadcasts into
    lookup joins — same caching effect, executor-side, no driver dict."""
    return spark.read.csv(path, schema=schema, header=header)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """S2-analog / multimodal base: binary assets as
    (path, modificationTime, length, content) rows. Filter pushdown works on
    path/length; content bytes stay columnar."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    return df.withColumn("file_name", F.element_at(F.split(F.col("path"), "/"), -1))
