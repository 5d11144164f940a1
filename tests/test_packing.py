"""Training-data ops: deterministic sampling, shard assignment, next-fit
sequence packing (operators/packing.py)."""

from pyspark.sql import functions as F

from ideafast_etl_spark.operators import packing


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, lang string, tokens long"
    )


def test_stratified_sample_is_deterministic_and_rate_shaped(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "zz") for i in range(2000)],
        "doc_id long, lang string",
    )
    rates = {"en": 0.5}
    a = packing.stratified_sample(df, "lang", rates, "doc_id", salt="x")
    b = packing.stratified_sample(
        df.repartition(7), "lang", rates, "doc_id", salt="x"
    )
    ka = sorted(r["doc_id"] for r in a.collect())
    kb = sorted(r["doc_id"] for r in b.collect())
    assert ka == kb  # partitioning-independent
    assert all(k % 2 == 0 for k in ka)  # zz stratum default rate 0 → dropped
    assert 400 <= len(ka) <= 600  # ~50% of the 1000 'en' docs
    # different salt → different (but still deterministic) sample
    kc = sorted(
        r["doc_id"]
        for r in packing.stratified_sample(
            df, "lang", rates, "doc_id", salt="y"
        ).collect()
    )
    assert kc != ka


def test_assign_shards_contiguous_positions_and_stability(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(500)], "doc_id long"
    )
    out = packing.assign_shards(df, 4, "doc_id", seed="e0").collect()
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r["shard_id"], []).append(r["shuffle_pos"])
    assert set(by_shard) == {0, 1, 2, 3}
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))  # dense 0..n-1
    # same seed → identical assignment regardless of partitioning
    again = packing.assign_shards(
        df.repartition(13), 4, "doc_id", seed="e0"
    ).collect()
    assert {(r["doc_id"], r["shard_id"], r["shuffle_pos"]) for r in again} == {
        (r["doc_id"], r["shard_id"], r["shuffle_pos"]) for r in out
    }


def test_pack_sequences_next_fit_boundaries(spark):
    # cap 10: [4, 4, 4] → bins [0, 0, 1]; oversize 25 gets its own bin
    rows = [
        (1, "en", 4), (2, "en", 4), (3, "en", 4),
        (4, "en", 25), (5, "en", 2),
        (10, "fr", 10), (11, "fr", 1),
    ]
    out = packing.pack_sequences(
        _docs(spark, rows), cap=10, group_cols=["lang"],
        order_col="doc_id", token_col="tokens",
    ).collect()
    got = {r["doc_id"]: (r["bin_id"], r["bin_pos"]) for r in out}
    assert got[1] == (0, 0) and got[2] == (0, 1)
    assert got[3] == (1, 0)          # 4+4+4 > 10 → new bin
    assert got[4] == (2, 0)          # oversize doc occupies bin 2 alone
    assert got[5] == (3, 0)          # cur=25 overflows → next opens bin 3
    assert got[10] == (0, 0)         # groups pack independently
    assert got[11] == (1, 0)         # 10+1 > 10 → new bin


def test_pack_sequences_respects_order_not_input_layout(spark):
    rows = [(3, "en", 6), (1, "en", 6), (2, "en", 6)]
    out = packing.pack_sequences(
        _docs(spark, rows).repartition(3), cap=12, group_cols=["lang"],
        order_col="doc_id", token_col="tokens",
    ).collect()
    got = {r["doc_id"]: (r["bin_id"], r["bin_pos"]) for r in out}
    # packed in doc_id order: (1,2) fill bin 0, 3 starts bin 1
    assert got[1] == (0, 0) and got[2] == (0, 1) and got[3] == (1, 0)


def test_stable_bucket_matches_duckdb_twin(spark):
    import duckdb

    df = spark.createDataFrame([(i,) for i in range(100)], "k long")
    ours = {
        r["k"]: r["b"]
        for r in df.select(
            "k", packing.stable_bucket("k", 97, "s").alias("b")
        ).collect()
    }
    theirs = dict(
        duckdb.sql(
            "SELECT k, ('0x' || substr(sha256(CAST(k AS VARCHAR) || 's'), 1, 15))::BIGINT % 97 "
            "FROM range(100) t(k)"
        ).fetchall()
    )
    assert ours == theirs


def test_leakage_safe_splits_cluster_members_share_split(spark):
    from ideafast_etl_spark.operators.packing import (
        leakage_safe_splits,
        stable_bucket,
    )

    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    # two planted clusters: {3,7,150} labeled 3 and {40,41} labeled 40
    clusters = spark.createDataFrame(
        [(3, 3), (7, 3), (150, 3), (40, 40), (41, 40)],
        "doc_id long, cluster_id long",
    )
    out = {r["doc_id"]: r.asDict() for r in
           leakage_safe_splits(docs, clusters).collect()}
    assert len(out) == 200
    assert out[3]["split"] == out[7]["split"] == out[150]["split"]
    assert out[40]["split"] == out[41]["split"]
    assert out[7]["rep"] == 3 and out[41]["rep"] == 40
    # unclustered docs: own-id rep, same bucket rule as dataset_splits
    b = spark.range(200).select(
        F.col("id").alias("doc_id"),
        stable_bucket(F.col("id"), 100, salt="split0").alias("bk"),
    )
    for r in b.collect():
        if r["doc_id"] in (3, 7, 150, 40, 41):
            continue
        want = "train" if r["bk"] < 80 else ("val" if r["bk"] < 90 else "test")
        assert out[r["doc_id"]]["split"] == want, r["doc_id"]


def test_weighted_sample_properties(spark):
    from ideafast_etl_spark.operators.packing import weighted_sample

    # ids 0..99 weight 1, ids 100..199 weight 20
    df = spark.createDataFrame(
        [(i, 1.0 if i < 100 else 20.0) for i in range(200)],
        "doc_id long, w double",
    )
    out = weighted_sample(df, F.col("w"), k=30)
    rows = out.collect()
    assert len(rows) == 30
    assert len({r["doc_id"] for r in rows}) == 30  # without replacement
    heavy = sum(1 for r in rows if r["doc_id"] >= 100)
    assert heavy >= 20  # 20x weights dominate the sample

    # deterministic under layout changes
    again = sorted(
        map(tuple, weighted_sample(df.repartition(7), F.col("w"), k=30).collect())
    )
    assert sorted(map(tuple, rows)) == again

    # inclusion follows the weights across independent salt draws
    freq = {True: 0, False: 0}
    for s in range(8):
        sel = weighted_sample(df, F.col("w"), k=30, salt=f"s{s}").collect()
        for r in sel:
            freq[r["doc_id"] >= 100] += 1
    assert freq[True] > 4 * freq[False]


def test_weighted_sample_weight_domain(spark):
    """r7 ADVICE: weight <= 0 rows are excluded (zero inclusion
    probability; the old null-safe divide made their es_key NULL and
    their fate nondeterministic), and sub-quantum positive weights
    (< 1e-6, which quantize to 0 micro-units) are floored to one unit —
    they rank deterministically instead of dividing by zero."""
    from ideafast_etl_spark.operators.packing import weighted_sample

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, 5e-7), (5, 2.0), (6, 3.0)],
        "doc_id long, w double",
    )
    rows = weighted_sample(df, F.col("w"), k=10).collect()
    ids = {r["doc_id"] for r in rows}
    assert 2 not in ids and 3 not in ids      # non-positive: never sampled
    assert ids == {1, 4, 5, 6}                # k > survivors: all kept
    tiny = [r for r in rows if r["doc_id"] == 4][0]
    assert tiny["es_key"] is not None         # floored, not NULL
    # the floored weight is tiny → its -ln(u)/w key is the worst rank
    assert tiny["rank"] == 4
