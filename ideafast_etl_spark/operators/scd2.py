"""Slowly-changing-dimension type 2 merge (§2.13 extension): versioned
dimension history as (key, attrs, valid_from, valid_to) rows, where the open
version has valid_to NULL. The reference keeps only current state (Mongo
upserts, db.py:88-125); SCD2 is what an analytics engine needs instead when
facts must join the dimension AS OF their event time (the as-of join in
operators/asof.py is the read-side companion).

Shape: ONE full-outer join on the key per merge batch (shuffle both sides on
key), then pure column selects — no windows, no iteration. Attribute
comparison is null-safe. Updates are DELTA batches: keys absent from the
batch keep their open row (use a tombstone attr for deletes).
"""

from __future__ import annotations

from collections.abc import Iterable
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: Iterable[str],
    attr_cols: Iterable[str],
    eff_date: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Apply one update batch to an SCD2 dimension and return the new
    history. For every update key: if the open row's attributes differ (or
    the key is new), the open row closes at ``eff_date`` and a new open
    version begins there; identical attributes are a no-op (idempotent
    re-application). History rows (valid_to set) pass through untouched.

    ``dim`` columns: key + attrs + valid_from + valid_to (NULL = open).
    ``updates`` columns: key + attrs. ``eff_date``: 'YYYY-MM-DD' literal.
    """
    keys = list(key_cols)
    attrs = list(attr_cols)
    eff = F.lit(eff_date).cast("timestamp")

    closed_hist = dim.filter(F.col(valid_to_col).isNotNull())
    open_rows = dim.filter(F.col(valid_to_col).isNull())

    d = open_rows.select(
        *[F.col(k).alias(f"_dk_{k}") for k in keys],
        *[F.col(a).alias(f"_da_{a}") for a in attrs],
        F.col(valid_from_col).alias("_d_from"),
    )
    u = updates.select(
        *[F.col(k).alias(f"_uk_{k}") for k in keys],
        *[F.col(a).alias(f"_ua_{a}") for a in attrs],
    )
    cond = reduce(
        Column.__and__,
        [F.col(f"_dk_{k}") == F.col(f"_uk_{k}") for k in keys],
    )
    j = d.join(u, cond, "full_outer")

    has_upd = F.col(f"_uk_{keys[0]}").isNotNull()
    has_dim = F.col(f"_dk_{keys[0]}").isNotNull()
    attrs_equal = reduce(
        Column.__and__,
        [F.col(f"_da_{a}").eqNullSafe(F.col(f"_ua_{a}")) for a in attrs],
    )
    changed = has_upd & (~has_dim | ~attrs_equal)

    def _out(key_src: str, attr_src: str, vfrom: Column, vto: Column) -> list[Column]:
        return (
            [F.col(f"_{key_src}_{k}").alias(k) for k in keys]
            + [F.col(f"_{attr_src}_{a}").alias(a) for a in attrs]
            + [vfrom.alias(valid_from_col), vto.alias(valid_to_col)]
        )

    # open rows with no (effective) change survive as-is
    surviving = j.filter(has_dim & ~changed).select(
        *_out("dk", "da", F.col("_d_from"), F.lit(None).cast("timestamp"))
    )
    # open rows superseded by a changed update close at eff
    newly_closed = j.filter(has_dim & changed).select(
        *_out("dk", "da", F.col("_d_from"), eff)
    )
    # every changed/new update key opens a new version at eff
    new_open = j.filter(changed).select(
        *_out("uk", "ua", eff, F.lit(None).cast("timestamp"))
    )
    return (
        closed_hist.select(*keys, *attrs, valid_from_col, valid_to_col)
        .unionByName(surviving)
        .unionByName(newly_closed)
        .unionByName(new_open)
    )


def scd2_init(
    snapshot: DataFrame,
    key_cols: Iterable[str],
    attr_cols: Iterable[str],
    eff_date: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Bootstrap an SCD2 history from a current-state snapshot: every row
    becomes the open version effective ``eff_date``."""
    return snapshot.select(
        *key_cols,
        *attr_cols,
        F.lit(eff_date).cast("timestamp").alias(valid_from_col),
        F.lit(None).cast("timestamp").alias(valid_to_col),
    )
