"""Orchestrator-agnostic DAG spec: same task chain as the reference DAG
(integrity checks mirror tests/dags/test_dreem_dag.py)."""

import pytest

from ideafast_etl_spark.pipeline.airflow_dag import build_dag, build_task_specs


def test_task_chain_matches_reference_shape():
    spec = build_task_specs(limits={"ingest": 15, "serial": 15, "upload": 1})
    ids = [t.task_id for t in spec.tasks]
    assert ids == [
        "ingest_metadata",
        "resolve_serial",
        "resolve_device_id",
        "resolve_patient",
        "group_records",
        "upload_groups",
    ]
    # linear chain, no cycles, each task depends on its predecessor
    for prev, t in zip(spec.tasks, spec.tasks[1:]):
        assert t.upstream == (prev.task_id,)
    # limits land as CLI args
    by_id = {t.task_id: t for t in spec.tasks}
    assert by_id["ingest_metadata"].extra_args == ("--limit", "15")
    assert by_id["upload_groups"].extra_args == ("--limit", "1")
    assert by_id["group_records"].extra_args == ()  # deliberately unlimited


def test_spark_submit_args_shape():
    spec = build_task_specs(state_dir="/data/state")
    args = spec.spark_submit_args(spec.tasks[0])
    assert "--state-dir" in args and "/data/state" in args
    assert "--stage" in args and "ingest" in args


def test_build_dag_requires_airflow():
    with pytest.raises(ImportError, match="apache-airflow"):
        build_dag()
