"""The end-to-end incremental pipeline (SURVEY.md §3.1 / §7.2.6) —
the reference's 7-task Airflow DAG (dags/dreem.py:299-307) as one PySpark
application over a state table. Stages (task 7, cleanup, is temp-dir
lifecycle handled by the store):

  1. ingest        — REST scan → shape (P2) → anti-join dedup (J1) → insert
  2. resolve_serial — F2 worklist × uid_map broadcast join (J2) → MERGE
  3. resolve_device — F1 worklist × serial_map broadcast join (J3) → MERGE
  4. resolve_patient — F3 worklist × interval-containment join (J4) → MERGE
  5. group          — F5 worklist → day-window bucket + dmp_id key (G1) → MERGE
  6. upload         — F6 groups → executor-side upload sink (K8) → flag (K6)

Every MERGE is non-overwriting (db.py:97-125); every stage re-selects its
worklist by NULL-rung predicate, so unresolved rows retry next run (late
data, §2.11). Per-run ``limits`` replicate the reference's backpressure knobs
(L1, dags/dreem.py:254-287); the default is unlimited, which is the correct
Spark posture (the limits exist in the reference because each record costs an
HTTP round-trip; here lookups are joins).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import filters
from ..operators.grouping import assign_group_id
from ..operators.joins import interval_containment_join
from ..operators.projections import init_lifecycle, shape_api_rows
from ..sinks.upload import Uploader, stub_uploader, upload_groups
from ..state.store import StateStore


@dataclass
class PipelineConfig:
    device_type: str = "DRM"
    cut_off_time: str = "12:00:00"
    # per-run batch caps; None = unlimited (reference: 15/15/15/15/-/1)
    limits: dict[str, int | None] = field(
        default_factory=lambda: {
            "ingest": None,
            "serial": None,
            "device": None,
            "patient": None,
            "upload": None,
        }
    )


def _limit(df: DataFrame, n: int | None) -> DataFrame:
    return df.limit(n) if n else df


class DreemPipeline:
    def __init__(
        self,
        spark: SparkSession,
        store: StateStore,
        config: PipelineConfig | None = None,
        uploader: Uploader = stub_uploader,
    ) -> None:
        self.spark = spark
        self.store = store
        self.config = config or PipelineConfig()
        self.uploader = uploader

    # -- stage 1 ---------------------------------------------------------------

    def ingest(self, raw_api_rows: DataFrame) -> int:
        """Shape vendor rows, drop already-seen hashes, insert the rest."""
        shaped = init_lifecycle(
            shape_api_rows(raw_api_rows, self.config.device_type)
        )
        shaped = _limit(shaped, self.config.limits.get("ingest"))
        before = self.store.read().count() if self.store.exists() else 0
        self.store.append_new(shaped)
        return self.store.read().count() - before

    # -- stages 2-3: lookup resolutions ---------------------------------------

    def resolve_serial(self, uid_map: DataFrame) -> int:
        """uid_map(dreem_uid, device_serial); fills device_serial where NULL."""
        work = filters.needing_serial(self.store.read())
        work = _limit(work, self.config.limits.get("serial"))
        resolved = work.select(
            "hash", F.col("meta.dreem_uid").alias("dreem_uid")
        ).join(F.broadcast(uid_map), "dreem_uid").select("hash", "device_serial")
        n = resolved.count()
        if n:
            self.store.merge_non_overwrite(
                resolved, ("device_serial",), partition_value=self.config.device_type
            )
        return n

    def resolve_device_id(self, serial_map: DataFrame) -> int:
        """serial_map(device_serial, device_id); fills device_id where NULL."""
        work = filters.needing_device_id(self.store.read(), self.config.device_type)
        work = _limit(work, self.config.limits.get("device"))
        resolved = work.select("hash", "device_serial").join(
            F.broadcast(serial_map), "device_serial"
        ).select("hash", "device_id")
        n = resolved.count()
        if n:
            self.store.merge_non_overwrite(
                resolved, ("device_id",), partition_value=self.config.device_type
            )
        return n

    # -- stage 4: interval join -----------------------------------------------

    def resolve_patient(self, assignments: DataFrame) -> int:
        """assignments(device_id, patient_id, start_wear, end_wear);
        interval-containment first-match (J4) fills patient_id."""
        work = filters.needing_patient(self.store.read(), self.config.device_type)
        work = _limit(work, self.config.limits.get("patient"))
        joined = interval_containment_join(
            work.select("hash", "device_id", "start", "end"),
            assignments,
            order_cols=("start_wear", "patient_id"),
        )
        resolved = joined.filter(F.col("patient_id").isNotNull()).select(
            "hash", "patient_id"
        )
        n = resolved.count()
        if n:
            self.store.merge_non_overwrite(
                resolved, ("patient_id",), partition_value=self.config.device_type
            )
        return n

    # -- stage 5: grouping ----------------------------------------------------

    def group_records(self) -> int:
        """Day-window bucket + dmp_id for every fully-resolved row.
        Deliberately unlimited (db.py:200: 'avoid data gaps')."""
        work = filters.needing_grouping(self.store.read(), self.config.device_type)
        grouped = assign_group_id(
            work.select("hash", "device_id", "patient_id", "start"),
            cut_off=self.config.cut_off_time,
            ts_col="start",
        ).select("hash", "dmp_id")
        n = grouped.count()
        if n:
            self.store.merge_non_overwrite(
                grouped, ("dmp_id",), partition_value=self.config.device_type
            )
        return n

    # -- stage 6: upload ------------------------------------------------------

    def upload(self) -> tuple[int, int]:
        """Upload pending groups; flag successes. At-least-once: failures stay
        is_uploaded=false and re-select next run (dags/dreem.py:209-217)."""
        pending = filters.pending_upload(self.store.read(), self.config.device_type)
        limit = self.config.limits.get("upload")
        if limit:
            ids = pending.select("dmp_id").distinct().limit(limit)
            pending = pending.join(ids, "dmp_id", "left_semi")
        results = upload_groups(pending, self.uploader)
        ok = results.filter(F.col("success"))
        n_ok = ok.count()
        n_fail = results.count() - n_ok
        if n_ok:
            self.store.mark_uploaded(ok.select("dmp_id"))
        return n_ok, n_fail

    # -- streaming variant ----------------------------------------------------

    def run_from_stream(
        self,
        source_dir: str,
        api_schema,
        uid_map: DataFrame,
        serial_map: DataFrame,
        assignments: DataFrame,
        checkpoint_dir: str | None = None,
    ) -> dict[str, int | tuple[int, int]]:
        """Streaming-ingest variant of a scheduled run: drain all available
        feed files through the checkpointed Structured-Streaming path
        (availableNow + foreachBatch MERGE), then run the resolution stages
        over the refreshed state — the reference's poll-then-process cycle
        with exactly-once file consumption."""
        from ..streaming.incremental import run_streaming_ingest

        before = self.store.read().count() if self.store.exists() else 0
        q = run_streaming_ingest(
            self.spark,
            source_dir,
            api_schema,
            self.store,
            device_type=self.config.device_type,
            checkpoint_dir=checkpoint_dir,
        )
        q.awaitTermination()
        ingested = self.store.read().count() - before
        return {
            "ingested": ingested,
            "serials": self.resolve_serial(uid_map),
            "devices": self.resolve_device_id(serial_map),
            "patients": self.resolve_patient(assignments),
            "grouped": self.group_records(),
            "uploaded": self.upload(),
        }

    # -- full run -------------------------------------------------------------

    def run(
        self,
        raw_api_rows: DataFrame,
        uid_map: DataFrame,
        serial_map: DataFrame,
        assignments: DataFrame,
    ) -> dict[str, int | tuple[int, int]]:
        """One scheduled run of the whole DAG, in reference task order."""
        return {
            "ingested": self.ingest(raw_api_rows),
            "serials": self.resolve_serial(uid_map),
            "devices": self.resolve_device_id(serial_map),
            "patients": self.resolve_patient(assignments),
            "grouped": self.group_records(),
            "uploaded": self.upload(),
        }
