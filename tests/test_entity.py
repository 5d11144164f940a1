"""Blocked fuzzy join (operators/entity.py): blocking recall/cost trade,
edit-distance filter, pair uniqueness."""

from pyspark.sql import functions as F

from ideafast_etl_spark.operators.entity import (
    blocked_fuzzy_pairs,
    first_token_block,
)


def _names(spark, rows):
    return spark.createDataFrame(rows, "id long, name string")


def test_pairs_within_block_and_distance(spark):
    df = _names(
        spark,
        [
            (1, "acme widget deluxe"),
            (2, "acme widget delux"),   # 1 edit from #1, same block
            (3, "acme gadget deluxe"),  # 3 edits from #1, same block
            (4, "zenith widget deluxe"),  # different first token: never compared
        ],
    )
    out = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in blocked_fuzzy_pairs(df, "name", "id", max_dist=4).collect()
    }
    assert out[(1, 2)] == 1
    assert out[(1, 3)] == 2  # widget -> gadget: two substitutions
    assert out[(2, 3)] == 3
    assert (1, 4) not in out and (2, 4) not in out and (3, 4) not in out
    # each unordered pair exactly once
    assert all(a < b for a, b in out)


def test_length_band_prunes_giant_blocks(spark):
    # same first token but very different lengths -> different bands,
    # never compared even though the token block matches
    df = _names(spark, [(1, "acme x"), (2, "acme " + "x" * 40)])
    out = blocked_fuzzy_pairs(df, "name", "id", max_dist=50).collect()
    assert out == []
    # with banding disabled they do meet (and fail only on distance)
    out2 = blocked_fuzzy_pairs(
        df, "name", "id", max_dist=50, block=lambda c: first_token_block(c, None)
    ).collect()
    assert len(out2) == 1


def test_distance_threshold_is_strict(spark):
    # same length (same band), distance exactly 2: t->x and a->o
    df = _names(spark, [(1, "alpha beta"), (2, "alpha bexo")])
    assert blocked_fuzzy_pairs(df, "name", "id", max_dist=1).collect() == []
    assert len(blocked_fuzzy_pairs(df, "name", "id", max_dist=2).collect()) == 1


def test_exact_duplicates_collapse_before_fuzzy(spark):
    # 5 identical copies of each of two near-names: NO within-group pairs
    # (that is exact_dedup's job); ONE group-level pair with multiplicities
    rows = [(i, "acme widget") for i in range(5)] + [
        (10 + i, "acme widgey") for i in range(5)
    ]
    out = blocked_fuzzy_pairs(_names(spark, rows), "name", "id", max_dist=2).collect()
    assert len(out) == 1
    (r,) = out
    assert (r["id_a"], r["id_b"], r["dist"], r["n_a"], r["n_b"]) == (0, 10, 1, 5, 5)
