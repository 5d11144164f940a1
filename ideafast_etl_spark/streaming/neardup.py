"""Streaming MinHash near-dup against evolving state (SURVEY.md §2.11 +
§2.13): the streaming flavor of the production dedup step — which incoming
documents near-duplicate anything already seen, where "seen" grows as the
stream drains.

``foreachBatch`` composition (the same posture as ``run_streaming_ingest``):
each micro-batch

1. computes MinHash signatures for the batch (one keyed agg),
2. band-joins batch bands against STATE bands plus the batch's own bands
   (incoming × seen only — never state × state, the scale-correct
   incremental plan),
3. verifies candidates by signature-estimated Jaccard (the share of equal
   MinHash components — an unbiased Jaccard estimator; the state keeps 32
   longs per doc instead of full shingle sets, the right state-size
   trade at 100 TB),
4. sinks the duplicate pairs to a parquet log relation — a
   batch-id-keyed subdirectory written in overwrite mode, so no driver
   memory is held and a replayed batch overwrites its own log instead of
   double-appending (r7 verdict item: the old ``dups.collect()`` into an
   in-memory list was O(batch² ) on the driver for a pathological batch
   and grew without bound across drains),
5. writes the NON-duplicate survivors' signatures to the state relation
   under the same batch-id-keyed overwrite discipline (duplicates are
   suppressed, exactly like J1's anti-join generalised to similarity).

Checkpointing gives exactly-once file consumption, and because both sinks
key on the micro-batch id, a batch replayed after a crash between the
writes and the checkpoint commit converges to the same state — no append
ever happens twice. ``dup_log`` remains as an optional DEBUG hook (a
driver-side list mirror of the parquet log); production callers leave it
None and read ``<state>.dups``. Reference analog: the polling DAG's
per-run dedup rung (``dags/dreem.py:299-307``), upgraded from exact hash
to near-dup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from ..operators.dedup import LSH_BANDS, LSH_ROWS, with_minhash

SIG_LEN = LSH_BANDS * LSH_ROWS


def _bands(df: DataFrame, id_col: str) -> DataFrame:
    """(id, minhash, band, band_key) rows — one per LSH band."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        F.element_at(F.col("minhash"), b * LSH_ROWS + r + 1)
                        for r in range(LSH_ROWS)
                    ],
                ).alias("band_key"),
            )
            for b in range(LSH_BANDS)
        ]
    )
    return df.select(
        F.col(id_col), F.col("minhash"), F.explode(bands).alias("bk")
    ).select(
        id_col, "minhash",
        F.col("bk.band").alias("band"),
        F.col("bk.band_key").alias("band_key"),
    )


def estimated_jaccard(a: Column, b: Column) -> Column:
    """Share of equal MinHash components — unbiased Jaccard estimator."""
    eq = F.zip_with(a, b, lambda x, y: (x == y).cast("int"))
    return (
        F.aggregate(eq, F.lit(0), lambda acc, v: acc + v).cast("double")
        / F.lit(SIG_LEN)
    )


def batch_near_dups(
    batch_sigs: DataFrame,
    state_sigs: DataFrame | None,
    id_col: str = "doc_id",
    sim_threshold: float = 0.5,
    candidates: str = "all",
) -> DataFrame:
    """(incoming_id, matched_id, est_jaccard) for batch docs matching the
    state or an EARLIER batch doc (id order breaks in-batch ties, so one
    survivor per in-batch dup cluster). Plan: banded equi-join incoming ×
    seen only, then the signature verify on candidates.

    ``candidates`` mirrors the batch operators' dup-density posture
    (operators/dedup.py, r9): the state side is survivor-only (a hot
    near-dup cluster leaves ONE state row), so the only quadratic leg is
    the in-batch self-join — a single dup-dense drop of n hot docs emits
    ~C(0.3 n, 2) pairs under ``"all"``. ``"star"`` pairs each incoming
    doc with its band bucket's min-id representative instead (state
    survivors included, so cross-batch matches still surface):
    O(members) candidates per bucket, same survivor set whenever hot
    members actually resemble their representative (the chain-shaped
    corner where A~B, B~C but A~C fails is the same documented contract
    change as the batch star posture)."""
    if candidates not in ("all", "star"):
        raise ValueError(f"unknown candidates mode {candidates!r}")
    b = _bands(batch_sigs, id_col)
    if state_sigs is not None:
        seen = _bands(state_sigs, id_col).union(b)
    else:
        seen = b
    if candidates == "star":
        reps = seen.groupBy("band", "band_key").agg(
            F.min(id_col).alias("matched_id"),
            F.min_by("minhash", id_col).alias("__mb"),
        )
        cand = (
            b.join(reps, ["band", "band_key"])
            .filter(F.col(id_col) > F.col("matched_id"))
            .select(
                F.col(id_col).alias("incoming_id"),
                "matched_id",
                F.col("minhash").alias("__ma"),
                "__mb",
            )
            .dropDuplicates(["incoming_id", "matched_id"])
        )
    else:
        cand = (
            b.alias("l")
            .join(
                seen.alias("r"),
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.band_key") == F.col("r.band_key"))
                & (F.col(f"l.{id_col}") > F.col(f"r.{id_col}")),
            )
            .select(
                F.col(f"l.{id_col}").alias("incoming_id"),
                F.col(f"r.{id_col}").alias("matched_id"),
                F.col("l.minhash").alias("__ma"),
                F.col("r.minhash").alias("__mb"),
            )
            .dropDuplicates(["incoming_id", "matched_id"])
        )
    return (
        cand.withColumn(
            "est_jaccard",
            F.round(estimated_jaccard(F.col("__ma"), F.col("__mb")), 6),
        )
        .filter(F.col("est_jaccard") >= sim_threshold)
        .select("incoming_id", "matched_id", "est_jaccard")
    )


def process_near_dup_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    dup_log_dir: str,
    sim_threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    dup_log: list | None = None,
    candidates: str = "all",
) -> None:
    """One micro-batch cycle of the streaming near-dup job — exposed at
    module level so a crash replay (same batch id, same rows) is directly
    testable. Both sinks overwrite their ``batch-<id>`` subdirectory, so
    re-running a batch converges instead of double-appending."""
    from .accum import live_paths, read_accumulation

    sigs = with_minhash(batch_df, text_col).select(id_col, "minhash")
    state = (
        read_accumulation(spark, state_dir)
        if live_paths(state_dir)
        else None
    )
    # A replayed batch sees its own previous (uncommitted-in-checkpoint)
    # state output: exclude this batch's subdirectories from "seen" so the
    # recompute matches the first execution exactly.
    if state is not None:
        own = F.input_file_name().contains(f"/batch-{batch_id}/")
        state = state.filter(~own)
        if not state.take(1):
            state = None
    dups = batch_near_dups(sigs, state, id_col, sim_threshold, candidates)
    # Sink the pairs first; the written parquet is then re-read for the
    # anti-join, so the banded join executes exactly once per batch.
    pair_dir = f"{dup_log_dir.rstrip('/')}/batch-{batch_id}"
    dups.withColumn("batch_id", F.lit(batch_id)).write.mode(
        "overwrite"
    ).parquet(pair_dir)
    logged = spark.read.parquet(pair_dir)
    if dup_log is not None:  # DEBUG hook only — bounded by the caller
        dup_log.extend(
            (r.batch_id, r.incoming_id, r.matched_id, r.est_jaccard)
            for r in logged.collect()
        )
    survivors = sigs.join(
        logged.select(F.col("incoming_id").alias(id_col)).distinct(),
        id_col,
        "left_anti",
    )
    survivors.write.mode("overwrite").parquet(
        f"{state_dir.rstrip('/')}/batch-{batch_id}"
    )


def run_streaming_near_dup(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    state_dir: str,
    checkpoint_dir: str | None = None,
    sim_threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    fmt: str = "parquet",
    dup_log: list | None = None,
    dup_log_dir: str | None = None,
    compact_after_batches: int | None = None,
    candidates: str = "all",
    dup_log_retain_batches: int | None = None,
) -> StreamingQuery:
    """Drain available files; per micro-batch detect near-dups against the
    signature state, sink the duplicate pairs to ``dup_log_dir`` (default
    ``<state_dir>.dups``) and the survivors' signatures to the state —
    both as batch-id-keyed overwrites, so replays converge. ``dup_log``
    is an optional driver-side DEBUG mirror of the pair log; leave it
    None in production (no unbounded driver state).
    ``compact_after_batches`` folds committed batch directories of both
    accumulations into consolidated snapshots at that directory count
    (accum module); the own-batch replay exclusion keeps working because
    a replayable batch is uncommitted and is never folded.
    ``candidates="star"`` applies the batch operators' dup-density
    posture to the in-batch self-join (see :func:`batch_near_dups`) —
    the setting for drop directories that can contain dup-dense
    deliveries. ``dup_log_retain_batches`` expires pair-log rows older
    than that many committed batches at compaction time (the signature
    state is never retention-filtered — see compact_accumulation)."""
    from .accum import (
        _batch_dirs,
        compact_accumulation,
        guard_fresh_checkpoint,
    )

    if checkpoint_dir is None:
        checkpoint_dir = state_dir.rstrip("/") + ".checkpoint"
    if dup_log_dir is None:
        dup_log_dir = state_dir.rstrip("/") + ".dups"
    guard_fresh_checkpoint(checkpoint_dir, state_dir, dup_log_dir)

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        process_near_dup_batch(
            spark, batch_df, batch_id, state_dir, dup_log_dir,
            sim_threshold=sim_threshold, text_col=text_col, id_col=id_col,
            dup_log=dup_log, candidates=candidates,
        )
        if compact_after_batches is not None:
            # the signature STATE is never retention-filtered — expiring
            # what the dedup remembers would re-admit old duplicates; only
            # the pair LOG ages out (r9 verdict #6)
            for d, retain in (
                (state_dir, None),
                (dup_log_dir, dup_log_retain_batches),
            ):
                if len(_batch_dirs(d)) >= compact_after_batches:
                    compact_accumulation(
                        spark, d, checkpoint_dir, retain_batches=retain
                    )

    stream = spark.readStream.format(fmt).schema(schema).load(source_dir)
    return (
        stream.writeStream.foreachBatch(_batch)
        .trigger(availableNow=True)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
