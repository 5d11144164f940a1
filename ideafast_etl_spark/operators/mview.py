"""Incremental materialized-view maintenance (algebraic aggregates).

At 100 TB you never recompute an aggregate table from scratch for a 0.1 %
daily delta: you maintain it. Two maintenance modes, both pure DataFrame
algebra:

- ``merge_states``: append-only refresh — union the previous partial
  state with the delta batch's partial state and re-aggregate. Sound for
  every *algebraic* aggregate (count/sum) and for min/max under
  insert-only deltas (monotone — a new row can only improve them).
- ``apply_cdc``: general refresh from a change feed (insert/delete/
  update pre+post images) via the signed-weight trick — count/sum
  maintain exactly under deletes; min/max do NOT (a deleted extreme
  cannot be un-taken algebraically) and are intentionally absent here.

Both shapes are keyed aggregations with map-side partial combine: the
delta (small) shuffles, the previous state shuffles at O(groups) not
O(history rows), and no raw history is ever rescanned. The reference's
pollers recompute their worklists per run (a full Mongo scan each cycle,
dags/dreem.py); this is the engine-side upgrade of that pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def agg_state(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, Column],
    count_col: str = "n",
) -> DataFrame:
    """Partial aggregate state for ``df``: per-key row count plus the given
    named sums. The state is itself mergeable: ``agg_state(a ∪ b) ==
    merge_states(agg_state(a), agg_state(b))``."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias(count_col),
        *[F.sum(c).alias(name) for name, c in sums.items()],
    )


def merge_states(
    prev: DataFrame,
    delta: DataFrame,
    keys: list[str],
    count_col: str = "n",
) -> DataFrame:
    """Merge two partial states (same schema): union + per-key sum of every
    non-key column. Groups present in only one side pass through; the
    re-aggregation is O(groups in prev + groups in delta), independent of
    the row history behind ``prev``."""
    val_cols = [c for c in prev.columns if c not in keys]
    delta_vals = [c for c in delta.columns if c not in keys]
    # set equality, not list equality: unionByName aligns by name, so a
    # state produced with a different select order is still valid
    if sorted(delta_vals) != sorted(val_cols):
        raise ValueError(
            f"prev/delta state schemas differ: {sorted(val_cols)} vs "
            f"{sorted(delta_vals)}"
        )
    from pyspark.sql.types import NumericType

    for side, label in ((prev, "prev"), (delta, "delta")):
        types = {f.name: f.dataType for f in side.schema.fields}
        bad = [c for c in val_cols if not isinstance(types[c], NumericType)]
        if bad:
            raise ValueError(f"non-summable {label} state columns: {bad}")
    merged = prev.unionByName(delta).groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in val_cols]
    )
    # empty groups can appear after CDC deltas net to zero — drop them so
    # the view equals a recompute (which never emits absent groups)
    return merged.filter(F.col(count_col) > 0)


def cdc_state(
    changes: DataFrame,
    keys: list[str],
    sums: dict[str, Column],
    change_type_col: str = "change_type",
    count_col: str = "n",
) -> DataFrame:
    """Turn a CDC feed (insert / delete / update_preimage /
    update_postimage rows, the state store's ``changes()`` contract,
    state/store.py) into a signed partial state mergeable with
    ``merge_states``: post-images count +1, pre-images/deletes −1."""
    w = F.when(
        F.col(change_type_col).isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    return changes.groupBy(*keys).agg(
        F.sum(w).alias(count_col),
        *[F.sum(w * c).alias(name) for name, c in sums.items()],
    )
