"""Shared maintenance for batch-id-keyed streaming accumulations.

The streaming twins (monitoring.py, neardup.py, corpus.py,
jsonl_ingest.py) all accumulate state as ``<accum>/batch-<id>``
subdirectories written in OVERWRITE mode — O(delta) per drain and
replay-idempotent (a micro-batch replayed after a crash between its
write and the checkpoint commit lands on its own directory). Two costs
come with that discipline, both handled here:

1. **Checkpoint-reset hazard** (r8 ADVICE): batch ids are only
   monotonic while the checkpoint survives. If the checkpoint is
   deleted (or a caller reuses an accumulation directory with a fresh
   checkpoint), ids restart at 0 and "idempotent overwrite" silently
   destroys the earlier batch-0, batch-1, ... data.
   :func:`guard_fresh_checkpoint` refuses to start a stream in that
   state.

2. **Directory growth** (r8 verdict #4): one subdirectory per drained
   batch forever; the recursive parquet read degrades with file count.
   :func:`compact_accumulation` folds batches that are COMMITTED in the
   checkpoint into one consolidated ``compact-<maxid>`` snapshot.
   Committed batches are never replayed by structured streaming (a
   restart resumes at the first uncommitted id), so folding them can
   never collide with a replay: the only replayable batch has no commit
   marker yet and keeps its own ``batch-<id>`` directory, which still
   overwrites cleanly after any number of compactions.

Compaction is crash-recoverable rather than atomic-to-readers: the
consolidated snapshot is staged under a dot-prefixed name (invisible to
Spark readers, which skip hidden paths), renamed into place, and only
then are the folded sources removed. A crash between the rename and the
removals leaves rows present twice ON DISK — :func:`read_accumulation`
is therefore the one true read path: it lists the top level and skips
any ``batch-<id>`` at or below the compacted high-water mark, so reads
stay exact in the crash window, and the next compaction (or stream
start) deletes the remnants.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

_BATCH_RE = re.compile(r"^batch-(\d+)$")
_COMPACT_RE = re.compile(r"^compact-(\d+)$")


def _batch_dirs(accum_dir: str) -> dict[int, str]:
    """{batch_id: absolute path} of the batch subdirectories present."""
    root = accum_dir.rstrip("/")
    if not os.path.isdir(root):
        return {}
    out = {}
    for e in os.scandir(root):
        m = _BATCH_RE.match(e.name)
        if m and e.is_dir():
            out[int(m.group(1))] = e.path
    return out


def _compact_dir(accum_dir: str) -> tuple[int, str] | None:
    """(high-water batch id, path) of the consolidated snapshot, if any."""
    root = accum_dir.rstrip("/")
    if not os.path.isdir(root):
        return None
    best = None
    for e in os.scandir(root):
        m = _COMPACT_RE.match(e.name)
        if m and e.is_dir():
            cand = (int(m.group(1)), e.path)
            if best is None or cand[0] > best[0]:
                best = cand
    return best


def _checkpoint_used(checkpoint_dir: str) -> bool:
    """True once the checkpoint has recorded at least one batch offset —
    from then on batch ids resume monotonically across restarts."""
    offsets = os.path.join(checkpoint_dir, "offsets")
    return os.path.isdir(offsets) and any(
        not e.name.startswith(".") for e in os.scandir(offsets)
    )


def committed_ids(checkpoint_dir: str) -> set[int]:
    """Batch ids with a commit marker — the ones structured streaming will
    never replay, hence the only ones compaction may fold."""
    commits = os.path.join(checkpoint_dir, "commits")
    if not os.path.isdir(commits):
        return set()
    return {
        int(e.name)
        for e in os.scandir(commits)
        if e.name.isdigit()
    }


def guard_fresh_checkpoint(checkpoint_dir: str, *accum_dirs: str) -> None:
    """Refuse to start a drain whose FRESH checkpoint would renumber
    batches from 0 over an accumulation that already holds batch data —
    the overwrite discipline would silently destroy it (r8 ADVICE).
    Recover deliberately instead: point at a new accumulation directory,
    or restore/keep the original checkpoint."""
    if _checkpoint_used(checkpoint_dir):
        return
    for d in accum_dirs:
        if _batch_dirs(d) or _compact_dir(d):
            raise ValueError(
                f"accumulation directory {d!r} already contains batch data "
                f"but checkpoint {checkpoint_dir!r} is empty: a fresh "
                "checkpoint restarts batch ids at 0 and the batch-id-keyed "
                "overwrites would destroy the existing data. Use a new "
                "accumulation directory or restore the original checkpoint."
            )


def _repair(accum_dir: str) -> None:
    """Remove crash remnants: folded batch dirs at or below the compacted
    high-water mark and abandoned hidden staging directories."""
    root = accum_dir.rstrip("/")
    if not os.path.isdir(root):
        return
    comp = _compact_dir(root)
    hwm = comp[0] if comp else -1
    for bid, path in _batch_dirs(root).items():
        if bid <= hwm:
            shutil.rmtree(path, ignore_errors=True)
    for e in os.scandir(root):
        if e.name.startswith(".compact-") and e.is_dir():
            shutil.rmtree(e.path, ignore_errors=True)
    if comp:  # superseded snapshots (crash between rename and removal)
        for e in os.scandir(root):
            m = _COMPACT_RE.match(e.name)
            if m and e.is_dir() and int(m.group(1)) < comp[0]:
                shutil.rmtree(e.path, ignore_errors=True)


def live_paths(accum_dir: str) -> list[str]:
    """The non-overlapping set of directories that together hold exactly
    one copy of every accumulated row — correct even in the
    crash-between-rename-and-removal window."""
    root = accum_dir.rstrip("/")
    comp = _compact_dir(root)
    hwm = comp[0] if comp else -1
    paths = [comp[1]] if comp else []
    paths.extend(
        p for bid, p in sorted(_batch_dirs(root).items()) if bid > hwm
    )
    return paths


def read_accumulation(spark: SparkSession, accum_dir: str) -> DataFrame:
    """The accumulated relation across all drained batches (consolidated
    snapshot + not-yet-compacted batch directories)."""
    paths = live_paths(accum_dir)
    if not paths:
        # preserve the historical recursive-read behavior (and its error
        # on a missing/empty accumulation)
        return spark.read.option("recursiveFileLookup", "true").parquet(
            accum_dir
        )
    return spark.read.option("recursiveFileLookup", "true").parquet(*paths)


def compact_accumulation(
    spark: SparkSession, accum_dir: str, checkpoint_dir: str
) -> int:
    """Fold every committed ``batch-<id>`` directory (plus the previous
    consolidated snapshot) into one ``compact-<maxid>`` snapshot; returns
    the number of batch directories folded. Replay-safe by construction:
    only committed ids fold, and the one batch a restart can replay is
    by definition uncommitted. Idempotent and crash-recoverable — see
    module docstring."""
    root = accum_dir.rstrip("/")
    _repair(root)
    committed = committed_ids(checkpoint_dir)
    batches = _batch_dirs(root)
    fold = {bid: p for bid, p in batches.items() if bid in committed}
    if not fold:
        return 0
    comp = _compact_dir(root)
    new_hwm = max(fold)
    srcs = ([comp[1]] if comp else []) + [p for _, p in sorted(fold.items())]
    staged = os.path.join(root, f".compact-{new_hwm}")
    (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(*srcs)
        .write.mode("overwrite")
        .parquet(staged)
    )
    final = os.path.join(root, f"compact-{new_hwm}")
    os.rename(staged, final)
    # visible from here; remnant removal below is repaired on crash
    if comp:
        shutil.rmtree(comp[1], ignore_errors=True)
    for p in fold.values():
        shutil.rmtree(p, ignore_errors=True)
    return len(fold)
