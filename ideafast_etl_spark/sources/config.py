"""Config/variable source (SURVEY.md §2.1 S6 + §2.6 J6).

The reference reads ``dmp_dataset_mappings`` from Airflow Variables and
connection URIs from Airflow Connections (dags/dreem.py:169,
init/variables.json.example). The Spark form: job config resolved driver-side
(env/spark.conf/JSON file), with small dict mappings applied either as a
literal ``create_map`` expression (constant-folded by Catalyst) or a
broadcast dim — never a per-row driver lookup.
"""

from __future__ import annotations

import json
import os
from itertools import chain

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def load_job_config(
    spark: SparkSession,
    defaults: dict[str, str] | None = None,
    env_prefix: str = "IDEAFAST_",
    json_path: str | None = None,
) -> dict[str, str]:
    """Resolve job config with precedence: spark.conf > env > json > defaults.
    Keys in spark.conf are read as ``spark.ideafast.<key>``."""
    cfg = dict(defaults or {})
    if json_path and os.path.exists(json_path):
        with open(json_path) as f:
            cfg.update({str(k): str(v) for k, v in json.load(f).items()})
    for k, v in os.environ.items():
        if k.startswith(env_prefix):
            cfg[k[len(env_prefix):].lower()] = v
    for k in list(cfg):
        conf_val = spark.conf.get(f"spark.ideafast.{k}", None)
        if conf_val is not None:
            cfg[k] = conf_val
    return cfg


def map_lookup(mapping: dict[str, str], key: Column | str, default: str | None = None) -> Column:
    """J6 — config equi-join as a literal map expression: Catalyst constant-
    folds the map, so the lookup is a pure projection (no join, no shuffle,
    no driver round-trip per row)."""
    k = F.col(key) if isinstance(key, str) else key
    m = F.create_map(*[F.lit(x) for x in chain.from_iterable(mapping.items())])
    looked = m.getItem(k)
    return F.coalesce(looked, F.lit(default)) if default is not None else looked


def apply_dmp_dataset(
    df: DataFrame,
    mappings: dict[str, str],
    study_col: str = "dmp_dataset",
    out_col: str = "dmp_dataset_id",
) -> DataFrame:
    """The reference's dataset-mapping step (currently hardcoded to 'TEST'
    upstream — dags/dreem.py:169,186-187, noted TODO there); here the
    per-record lookup the TODO asks for."""
    return df.withColumn(out_col, map_lookup(mappings, F.coalesce(F.col(study_col), F.lit("TEST"))))
