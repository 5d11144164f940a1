"""Airflow orchestration of the Spark pipeline (BASELINE north star:
"Airflow-scheduled Spark jobs for ETL"; reference DAG shape
dags/dreem.py:299-307).

The DAG mirrors the reference's 7-task chain, but each task is a
``spark-submit`` of the CLI (one stage per task) instead of in-worker Python:
Airflow owns scheduling/retries/alerting, Spark owns all data movement, and
the tasks share state only through the state table — the same
no-XCom-data-handoff contract as the reference.

``build_task_specs`` is orchestrator-agnostic (plain data, fully testable
here); ``build_dag`` materialises it into an Airflow DAG when Airflow is
installed (it is not in this environment — the import is guarded).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class TaskSpec:
    task_id: str
    stage: str
    upstream: tuple[str, ...] = ()
    extra_args: tuple[str, ...] = ()


@dataclass
class DagSpec:
    dag_id: str
    state_dir: str
    tasks: list[TaskSpec] = field(default_factory=list)

    def spark_submit_args(self, task: TaskSpec) -> list[str]:
        return [
            "--master", "yarn",  # or k8s:// — deployment config
            "--deploy-mode", "cluster",
            "--py-files", "ideafast_etl_spark.zip",
            "-m", "ideafast_etl_spark",
            "--state-dir", self.state_dir,
            "--stage", task.stage,
            *task.extra_args,
        ]


def build_task_specs(
    dag_id: str = "dreem",
    state_dir: str = "s3://bucket/state/dreem",
    limits: dict[str, int] | None = None,
) -> DagSpec:
    """The reference's task chain (download_metadata >> resolve uid >>
    resolve device >> resolve patient >> group >> upload >> cleanup), with
    cleanup folded into the upload stage's scratch lifecycle."""
    limits = limits or {}

    def lim(stage: str) -> tuple[str, ...]:
        return ("--limit", str(limits[stage])) if stage in limits else ()

    spec = DagSpec(dag_id=dag_id, state_dir=state_dir)
    chain = [
        TaskSpec("ingest_metadata", "ingest", (), lim("ingest")),
        TaskSpec("resolve_serial", "serial", ("ingest_metadata",), lim("serial")),
        TaskSpec("resolve_device_id", "device", ("resolve_serial",), lim("device")),
        TaskSpec("resolve_patient", "patient", ("resolve_device_id",), lim("patient")),
        TaskSpec("group_records", "group", ("resolve_patient",)),
        TaskSpec("upload_groups", "upload", ("group_records",), lim("upload")),
    ]
    spec.tasks = chain
    return spec


def build_dag(spec: DagSpec | None = None):
    """Materialise as an Airflow DAG (requires apache-airflow +
    apache-airflow-providers-apache-spark at deployment)."""
    try:
        from airflow import DAG
        from airflow.providers.apache.spark.operators.spark_submit import (
            SparkSubmitOperator,
        )
    except ImportError as e:  # pragma: no cover - airflow absent here
        raise ImportError(
            "apache-airflow (+ spark provider) is required to build the DAG; "
            "use build_task_specs() for the orchestrator-agnostic plan"
        ) from e

    spec = spec or build_task_specs()
    dag = DAG(spec.dag_id, schedule_interval=None, catchup=False)
    ops = {}
    for t in spec.tasks:
        ops[t.task_id] = SparkSubmitOperator(
            task_id=t.task_id,
            application="-m ideafast_etl_spark",
            application_args=self_args(spec, t),
            dag=dag,
        )
    for t in spec.tasks:
        for up in t.upstream:
            ops[up] >> ops[t.task_id]
    return dag


def self_args(spec: DagSpec, task: TaskSpec) -> list[str]:
    return ["--state-dir", spec.state_dir, "--stage", task.stage, *task.extra_args]
