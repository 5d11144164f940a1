"""Stream-stream joins with watermark-bounded state (SURVEY.md §2.11 depth).

The batch pipeline's enrichments are stream-static joins (worklist × dim);
this is the genuinely-streaming case: BOTH sides unbounded, each buffering
rows until the other side's matches can no longer arrive. The watermark +
event-time range condition is what makes state finite — without the range
bound Spark must keep every row forever (and refuses inner stream-stream
joins without a watermark on append output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "lts",
    right_ts: str = "rts",
    watermark: str = "1 hour",
    max_lag: str = "INTERVAL 30 MINUTES",
) -> DataFrame:
    """Inner join of two event streams on ``key`` where the right event
    arrives within [left_ts, left_ts + max_lag] — e.g. click joined to the
    impression that preceded it. Both sides carry the same watermark; the
    range condition lets Spark evict buffered rows older than
    watermark + lag, so join state is O(window), not O(stream)."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    return lw.join(
        rw,
        (lw[key] == rw[key])
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(max_lag)),
        "inner",
    ).drop(rw[key])
