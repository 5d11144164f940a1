"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.11/§2.12 — the extension surface for operators Structured
Streaming lacks natively).

``dedup_with_ttl`` is the streaming row-dedup with bounded per-key state the
reference's unbounded Mongo hash registry cannot provide: each content hash
keeps state only until the TTL passes with no new sightings, then the state
times out and is dropped — at 100 TB the state store stays O(active keys),
not O(history).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_with_ttl(
    stream: DataFrame,
    hash_col: str = "hash",
    ttl_ms: int = 24 * 3600 * 1000,
) -> DataFrame:
    """Emit only the FIRST occurrence of each key; remember seen keys in
    per-group state with a processing-time TTL. Input must be a streaming
    DataFrame with ``hash_col``; output schema: (hash, first_seen_batch_rows).
    """
    out_schema = f"{hash_col} string, n_suppressed long"
    state_schema = "seen long"

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        if state.exists:
            (seen,) = state.get
            state.update((seen + n,))
            # key already emitted before → suppress everything
        else:
            state.update((n,))
            yield pd.DataFrame({hash_col: [key[0]], "n_suppressed": [n - 1]})
        state.setTimeoutDuration(ttl_ms)

    return (
        stream.groupBy(hash_col)
        .applyInPandasWithState(
            _fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def funnel_track(
    stream: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Stateful streaming funnel: per-user progression through ``stages``
    with strictly-increasing event times, emitting one row per stage
    advance. The streaming counterpart of the batch ``event_funnel``
    query — identical results when events arrive in time order (the
    ingest contract; out-of-order arrivals only ever UNDER-count, never
    corrupt state).

    State per user is two scalars (stage index + last transition time).
    With ``ttl_ms`` unset the state store grows O(all users ever seen) —
    completed and long-inactive users are never evicted. Pass a
    processing-time ``ttl_ms`` (refreshed on every batch that touches the
    user) to bound it to O(users active within the TTL), the same
    discipline as ``dedup_with_ttl``. The trade: a user evicted mid- (or
    post-) funnel who later returns restarts at stage 0, so early stages
    can be re-emitted — size the TTL to the funnel's real completion
    horizon. Output: (user_col, stage, stage_name, ts).
    """
    out_schema = f"{user_col} long, stage int, stage_name string, {ts_col} timestamp"
    state_schema = "stage int, last_us long"

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        stage, last_us = state.get if state.exists else (0, -1)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0 or stage >= len(stages):
            state.update((stage, last_us))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            return
        pdf = pdf.sort_values(ts_col, kind="mergesort", ignore_index=True)
        us = (pdf[ts_col].astype("int64") // 1000) * 1000  # ns -> us grid
        rows = []
        for i in range(len(pdf)):
            if stage >= len(stages):
                break
            t = int(us.iloc[i])
            if pdf[type_col].iloc[i] == stages[stage] and (
                stage == 0 or t > last_us
            ):
                rows.append(
                    {
                        user_col: key[0],
                        "stage": stage + 1,
                        "stage_name": stages[stage],
                        ts_col: pdf[ts_col].iloc[i],
                    }
                )
                last_us = t
                stage += 1
        state.update((stage, last_us))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if rows:
            yield pd.DataFrame(rows)

    return stream.groupBy(user_col).applyInPandasWithState(
        _fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if ttl_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )
