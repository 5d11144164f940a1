"""As-of (time-series) join — an operator Spark lacks natively.

``asof_join`` attaches, to every left row, the payload of the most recent
right row with the same key at-or-before the left timestamp (backward
inclusive). Implemented Spark-first with the union-tag + forward-fill trick:

  1. tag both sides and union them into one event stream per key
     (``unionByName(allowMissingColumns=True)`` null-pads each side),
  2. sort within key by (ts, side, tie-break) — right rows sort before left
     rows at the same instant, so "at-or-before" is inclusive,
  3. forward-fill the right payload with ``last(..., ignorenulls=True)`` over
     an unbounded-preceding window — as ONE STRUCT, so all payload columns
     come atomically from the same right row even when some fields are NULL,
  4. keep only left rows and explode the struct back into columns.

One shuffle on the key, a single sort, no range self-join blowup — the same
shape ``pd.merge_asof`` uses single-node, distributed per key. (Alternative
for few keys + huge time ranges: bucketize time and equi-join on bucket.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: tuple[str, ...],
    tie_break: str | None = None,
    bucket: str | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join. ``tie_break`` (a right column) makes
    the winner among same-instant right rows deterministic (max wins).
    Output: all left columns + ``payload_cols`` (NULL when no prior right
    row exists for the key).

    ``bucket`` (e.g. ``"1 day"``) switches to the skew-proof two-phase
    plan (r8): forward fill is LOCF state, so it decomposes over
    (key, time-bucket) — fill within the bucket, then each bucket
    inherits the last non-null payload of the PREVIOUS present buckets
    (an O(present-buckets) per-key stitch), joined back on the
    skew-diluted (key, bucket) key. Same winner per row → identical
    output; a hot key's sort spreads over its buckets."""
    l_tagged = left.withColumn("_ts", F.col(left_ts)).withColumn("_src", F.lit(1))

    r_cols = [
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_src"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_payload"),
    ]
    if tie_break:
        r_cols.append(F.col(tie_break).alias("_tie"))
    r_tagged = right.select(*r_cols)

    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    order = [F.col("_ts").asc(), F.col("_src").asc()]
    if tie_break:
        order.append(F.col("_tie").asc_nulls_first())

    if bucket is None:
        w = (
            Window.partitionBy(on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = u.withColumn(
            "_filled", F.last("_payload", ignorenulls=True).over(w)
        )
    else:
        ub = u.withColumn("_bkt", F.window(F.col("_ts"), bucket)["start"])
        wl = (
            Window.partitionBy(on, "_bkt")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        loc = ub.withColumn(
            "_lfilled", F.last("_payload", ignorenulls=True).over(wl)
        )
        # one row per present (key, bucket): the bucket's final filled
        # payload (its last row's LOCF state; NULL when the bucket has no
        # right row)
        okey = [F.col("_ts"), F.col("_src")] + (
            [F.col("_tie")] if tie_break else []
        )
        bounds = loc.groupBy(on, "_bkt").agg(
            F.max_by(F.col("_lfilled"), F.struct(*okey)).alias("_blast")
        )
        wu = Window.partitionBy(on).orderBy("_bkt").rowsBetween(
            Window.unboundedPreceding, -1
        )
        carry = bounds.withColumn(
            "_carry", F.last("_blast", ignorenulls=True).over(wu)
        )
        filled = loc.join(
            carry.select(
                F.col(on).alias("_con"), F.col("_bkt").alias("_cbkt"), "_carry"
            ),
            (F.col(on) == F.col("_con"))
            & F.col("_bkt").eqNullSafe(F.col("_cbkt")),
        ).withColumn("_filled", F.coalesce(F.col("_lfilled"), F.col("_carry")))

    out = filled.filter(F.col("_src") == 1)
    for c in payload_cols:
        out = out.withColumn(c, F.col(f"_filled.{c}"))
    return out.drop(
        "_ts", "_src", "_tie", "_payload", "_filled",
        "_bkt", "_lfilled", "_con", "_cbkt", "_carry",
    )
