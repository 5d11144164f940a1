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
