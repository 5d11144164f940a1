"""Dynamic partition pruning: a selective dimension filter must prune the
partitioned fact scan at RUNTIME (no static predicate on the fact side).

At 100 TB the state/events tables are laid out partitioned by their hot
filter keys (see state/store.py and SCALE.md); DPP is what keeps a
dim-filtered join from scanning every partition of the fact. This test
pins the capability so a conf or layout change that silently disables it
fails loudly.
"""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    fact = spark.range(1000).select(
        (F.col("id") % 10).alias("k"), F.col("id").alias("v")
    )
    path = str(tmp_path / "fact_parted")
    fact.write.partitionBy("k").parquet(path)
    facts = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [(i, "keep" if i in (3, 7) else "drop") for i in range(10)],
        ["k", "tag"],
    )
    joined = facts.join(F.broadcast(dim.filter(F.col("tag") == "keep")), "k")
    plan = _plan(joined)
    assert "dynamicpruning" in plan.lower(), plan
    # correctness: only partitions k=3 and k=7 contribute
    got = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("k").alias("parts"),
    ).first()
    assert (got["n"], got["parts"]) == (200, 2)


def test_static_partition_pruning_still_prunes(spark, tmp_path):
    fact = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("v")
    )
    path = str(tmp_path / "fact_static")
    fact.write.partitionBy("k").parquet(path)
    df = spark.read.parquet(path).filter(F.col("k") == 2)
    plan = _plan(df)
    seg = plan.split("PartitionFilters")[1][:120] if "PartitionFilters" in plan else ""
    assert "k" in seg and "2" in seg, plan
    assert df.count() == 20
