"""State table with MERGE-style non-overwrite transitions (SURVEY.md §1.3, §7.4.4).

The reference keeps pipeline state in a MongoDB collection whose updates
deliberately never overwrite already-resolved values (``{"device_id": None}``
in every update filter — ideafast_etl/hooks/db.py:99,115,121). Here the state
is a parquet snapshot directory with an atomic pointer swap; every transition
is expressed as a join + ``coalesce(target, update)`` — i.e. exactly
``MERGE ... WHEN MATCHED AND target.col IS NULL THEN UPDATE``.

Why snapshot-swap and not in-place: parquet is immutable; Delta Lake's MERGE
is the production path (this class is the fallback the test env needs — no
delta-spark wheel here). The interface is MERGE-shaped so Delta slots in
without touching callers.

Scale posture: snapshots are partitioned by ``device_type`` (the reference's
every worklist predicate filters on it → partition pruning); updates join on
the uniformly-distributed ``hash`` key (no skew); nothing is ever collected
to the driver.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_POINTER = "_CURRENT"


class StateStore:
    """Versioned parquet state table with atomic pointer swap."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str = "hash",
        partition_by: tuple[str, ...] = ("device_type",),
        keep_versions: int = 1,
    ) -> None:
        """``keep_versions`` > 1 retains older snapshots for time travel
        (``read(version=...)`` / ``versions()``) — the snapshot-store analog
        of Delta's VERSION AS OF, bounded so storage stays O(keep_versions)."""
        self.spark = spark
        self.path = path
        self.key = key
        self.partition_by = partition_by
        self.keep_versions = max(1, keep_versions)
        os.makedirs(path, exist_ok=True)

    # -- snapshot mechanics ---------------------------------------------------

    def _pointer_file(self) -> str:
        return os.path.join(self.path, _POINTER)

    def current_version(self) -> str | None:
        try:
            with open(self._pointer_file()) as f:
                return f.read().strip() or None
        except FileNotFoundError:
            return None

    def _snapshot_dir(self, version: str) -> str:
        return os.path.join(self.path, f"v_{version}")

    def exists(self) -> bool:
        return self.current_version() is not None

    def versions(self) -> list[str]:
        """Retained snapshot versions, oldest first (monotone timestamps)."""
        return sorted(
            d[2:] for d in os.listdir(self.path) if d.startswith("v_")
        )

    def read(self, version: str | None = None) -> DataFrame:
        """Read the current snapshot, or a retained historical one."""
        version = version or self.current_version()
        if version is None:
            raise FileNotFoundError(f"state store at {self.path} not initialised")
        if not os.path.isdir(self._snapshot_dir(version)):
            raise FileNotFoundError(
                f"version {version} not retained (keep_versions={self.keep_versions})"
            )
        return self.spark.read.parquet(self._snapshot_dir(version))

    def _write_snapshot(self, df: DataFrame) -> None:
        version = f"{time.time_ns()}"
        out = self._snapshot_dir(version)
        if df.isEmpty():
            # a partitionBy write of an empty frame emits NO files (no schema
            # footer) and the snapshot becomes unreadable; write one empty
            # schema-bearing part file instead
            df.repartition(1).write.mode("overwrite").parquet(out)
        else:
            writer = df.write.mode("overwrite")
            if self.partition_by:
                writer = writer.partitionBy(*self.partition_by)
            writer.parquet(out)
        # atomic pointer swap: readers see old or new, never partial
        self._swap_pointer(version)

    def _gc(self, keep: tuple[str, ...]) -> None:
        current = self.current_version()
        keep_dirs = {f"v_{v}" for v in keep} | ({f"v_{current}"} if current else set())
        # retain up to keep_versions most-recent snapshots beyond the pinned set
        all_versions = sorted(
            (d for d in os.listdir(self.path) if d.startswith("v_")), reverse=True
        )
        keep_dirs |= set(all_versions[: self.keep_versions])
        for d in all_versions:
            if d not in keep_dirs:
                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)

    def _swap_pointer(self, version: str) -> None:
        tmp = self._pointer_file() + ".tmp"
        with open(tmp, "w") as f:
            f.write(version)
        os.replace(tmp, self._pointer_file())
        self._gc(keep=(version,))

    def _write_partition_selective(
        self, merged_partition: DataFrame, partition_value: str
    ) -> None:
        """Snapshot write that rewrites ONLY one partition's data and
        hardlinks every other partition's files from the current snapshot —
        O(affected partition) instead of O(table) per merge. This is the
        snapshot-store analog of Delta MERGE's file-level rewrite: at 100 TB
        a stage that touches one device_type must not rewrite the other ten.
        """
        assert len(self.partition_by) == 1
        pcol = self.partition_by[0]
        old_version = self.current_version()
        old_dir = self._snapshot_dir(old_version)
        version = f"{time.time_ns()}"
        out = self._snapshot_dir(version)
        (
            merged_partition.write.mode("overwrite")
            .partitionBy(pcol)
            .parquet(out)
        )
        skip = f"{pcol}={partition_value}"
        for entry in os.listdir(old_dir):
            src = os.path.join(old_dir, entry)
            if not os.path.isdir(src) or entry == skip or not entry.startswith(f"{pcol}="):
                continue
            dst = os.path.join(out, entry)
            os.makedirs(dst, exist_ok=True)
            for fn in os.listdir(src):
                if fn.startswith(("_", ".")):
                    continue
                os.link(os.path.join(src, fn), os.path.join(dst, fn))
        self._swap_pointer(version)

    # -- MERGE-shaped transitions --------------------------------------------

    def init(self, df: DataFrame) -> None:
        self._write_snapshot(df)

    def append_new(self, incoming: DataFrame) -> None:
        """K1/K2 + J1 — insert rows whose key is not yet in state
        (``MERGE ... WHEN NOT MATCHED THEN INSERT``). Anti-join keeps the
        dedup distributed (no driver-side hash set, unlike db.py:228-231).
        Also drops duplicate keys *within* the batch — a single micro-batch
        may drain overlapping source files."""
        incoming = incoming.dropDuplicates([self.key])
        if not self.exists():
            self.init(incoming)
            return
        state = self.read()
        fresh = incoming.join(
            state.select(self.key), on=self.key, how="left_anti"
        )
        self._write_snapshot(state.unionByName(fresh))

    def merge_non_overwrite(
        self,
        updates: DataFrame,
        set_cols: tuple[str, ...],
        partition_value: str | None = None,
        broadcast_updates: bool = True,
    ) -> None:
        """K3-K6 — ``MERGE ... WHEN MATCHED AND target.col IS NULL THEN
        UPDATE``: fill ``set_cols`` from ``updates`` (keyed by ``self.key``)
        only where the current value is NULL. Non-matching rows and already-
        resolved values pass through untouched (db.py:97-125 semantics).

        With ``partition_value`` (a value of the single partition column —
        e.g. the stage's device_type), only that partition is merged and
        rewritten; all other partitions are hardlinked into the new snapshot.

        ``broadcast_updates`` fits the usual worklist-sized batches; pass
        False for bulk backfills larger than executor memory — the join then
        shuffles both sides on the uniform hash key.
        """
        selective = partition_value is not None and len(self.partition_by) == 1
        state = self.read()
        target = (
            state.filter(F.col(self.partition_by[0]) == partition_value)
            if selective
            else state
        )
        upd = updates.select(
            F.col(self.key),
            *[F.col(c).alias(f"__new_{c}") for c in set_cols],
        )
        if broadcast_updates:
            upd = F.broadcast(upd)
        merged = target.join(upd, on=self.key, how="left")
        for c in set_cols:
            merged = merged.withColumn(c, F.coalesce(F.col(c), F.col(f"__new_{c}")))
        merged = merged.drop(*[f"__new_{c}" for c in set_cols])
        if selective:
            self._write_partition_selective(merged, partition_value)  # type: ignore[arg-type]
        else:
            self._write_snapshot(merged)

    def _quarantined_delete(self, keys: DataFrame) -> int:
        """K7 — delete by key. The reference name-mangles this and warns
        'Never use this method within the pipeline' (db.py:127-133); we keep
        it equally quarantined: UserWarning + explicit anti-join rewrite.
        Returns number of rows removed."""
        import warnings

        warnings.warn(
            "Never use this method within the pipeline — deletes break the "
            "append-only lifecycle; quarantined exactly like the reference.",
            UserWarning,
            stacklevel=2,
        )
        state = self.read()
        kept = state.join(keys.select(self.key), on=self.key, how="left_anti")
        removed = state.count() - kept.count()
        if removed:
            self._write_snapshot(kept)
        return removed

    def mark_uploaded(self, dmp_ids: DataFrame) -> None:
        """K6 — flip ``is_uploaded`` for every row of the given groups
        (db.py:189-196); idempotent (at-least-once delivery, §2.11)."""
        state = self.read()
        flagged = dmp_ids.select(F.col("dmp_id"), F.lit(True).alias("__up"))
        merged = (
            state.join(F.broadcast(flagged), on="dmp_id", how="left")
            .withColumn(
                "is_uploaded",
                F.when(F.col("__up").isNotNull(), F.lit(True)).otherwise(
                    F.col("is_uploaded")
                ),
            )
            .drop("__up")
        )
        self._write_snapshot(merged)
