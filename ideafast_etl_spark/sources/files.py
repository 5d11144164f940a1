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


def distributed_fetch(
    refs: DataFrame,
    fetch,
    url_col: str = "data_url",
    id_col: str = "manufacturer_ref",
) -> DataFrame:
    """S2 — distributed binary fetch: resolve each row's signed URL to content
    bytes executor-side (the reference streams each file driver-side, one at a
    time — drm.py:48-90; here every partition fetches concurrently and the
    bytes land as a binary column, never touching the driver).

    ``fetch(url) -> bytes | None`` is injected (None = file not yet available
    upstream → row dropped, retried next run per F9). Arrow-batched
    ``mapInPandas``; one session per partition in a real HTTP impl."""
    import pandas as pd

    out_schema = f"{id_col} string, content binary"

    def _batches(batches):
        for pdf in batches:
            rows = []
            for r in pdf.to_dict("records"):  # no per-row Series (iterrows) in the hot path
                content = fetch(r[url_col]) if r[url_col] is not None else None
                if content is not None:
                    rows.append({id_col: r[id_col], "content": content})
            yield pd.DataFrame(rows, columns=[id_col, "content"])

    return refs.select(id_col, url_col).mapInPandas(_batches, schema=out_schema)


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
