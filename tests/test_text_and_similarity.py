"""Text-analysis functions and embedding similarity on tiny fixtures."""

import math

from pyspark.sql import functions as F

from ideafast_etl_spark.functions import text as T
from ideafast_etl_spark.operators import similarity


def test_word_and_token_counts(spark):
    df = spark.createDataFrame([("Hello, world! 42",), ("",)], ["text"])
    rows = df.select(
        T.word_count("text").alias("w"), T.token_count("text").alias("t")
    ).collect()
    # tokens: Hello , world ! 42 → 5
    assert (rows[0]["w"], rows[0]["t"]) == (3, 5)
    assert (rows[1]["w"], rows[1]["t"]) == (0, 0)


def test_punct_and_stopword_ratio(spark):
    df = spark.createDataFrame([("the cat, the hat",)], ["text"])
    r = df.select(
        T.punct_ratio("text").alias("p"), T.stopword_ratio("text").alias("s")
    ).first()
    assert abs(r["p"] - 1 / 16) < 1e-9  # one comma in 16 chars
    assert abs(r["s"] - 2 / 4) < 1e-9  # 'the' twice in 4 words


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog is in that house"),
         (2, "der hund und die katze ist nicht auf"),
         (3, "xyz qpr"),],
        ["i", "text"],
    )
    out = {r["i"]: r["g"] for r in df.select("i", T.lang_id("text").alias("g")).collect()}
    assert out == {1: "en", 2: "de", 3: "und"}


def test_cosine_matches_numpy(spark):
    import numpy as np

    a = [1.0, 2.0, 3.0]
    b = [3.0, 2.0, 1.0]
    df = spark.createDataFrame([(a, b)], ["a", "b"])
    got = df.select(similarity.cosine(F.col("a"), F.col("b")).alias("c")).first()["c"]
    expect = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert math.isclose(got, expect, rel_tol=1e-12)


def test_brute_force_topk_ranks_by_similarity(spark):
    vecs = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),   # closest to 0
        (2, [0.0, 1.0]),   # orthogonal to 0
        (3, [0.7, 0.3]),
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    q = df.filter(F.col("vec_id") == 0)
    out = similarity.brute_force_topk(df, q, k=2).collect()
    assert [(r["neighbor_id"], r["rank"]) for r in out] == [(1, 1), (3, 2)]


def test_lsh_topk_subset_of_brute_force_quality(spark):
    # LSH candidates are approximate, but identical vectors always share all
    # bucket bits, so an exact duplicate must be retrieved as rank 1
    vecs = [(i, [float(i % 7), float((i * 3) % 5), 1.0]) for i in range(20)]
    vecs.append((100, [2.5, 1.3, 0.7]))
    vecs.append((101, [2.5, 1.3, 0.7]))  # dup of 100
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    q = df.filter(F.col("vec_id") == 100)
    out = similarity.lsh_topk(df, q, dim=3, k=3).collect()
    assert out[0]["neighbor_id"] == 101
    assert out[0]["cosine_sim"] == 1.0


def test_lang_id_tie_breaks_to_first_code(spark):
    # "la" is a marker for BOTH es and fr (score 1 each): ties must go to the
    # alphabetically-first code, matching the oracle's CASE order (ADVICE r1)
    df = spark.createDataFrame([("la",), ("le la est",)], ["t"])
    got = [r["l"] for r in df.select(T.lang_id("t").alias("l")).collect()]
    assert got[0] == "es"   # es vs fr tie → es
    assert got[1] == "fr"   # fr outright winner stays fr


def test_grid_near_dup_matches_brute_force(spark):
    # deterministic-complete blocking: grid-blocked result must EQUAL the
    # brute-force exact pairs (recall 1.0), including a borderline pair
    import random

    rng = random.Random(7)
    vecs = []
    for i in range(40):
        vecs.append((i, [rng.uniform(-1, 1) for _ in range(16)]))
    # planted near-dups: tiny perturbations of vectors 0 and 17
    for src, nid in ((0, 100), (17, 101)):
        base = vecs[src][1]
        vecs.append((nid, [x * (1 + 0.001 * ((k % 5) - 2)) for k, x in enumerate(base)]))
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    grid = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in similarity.grid_near_dup_pairs(df, threshold=0.95).collect()
    }
    brute = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in similarity.embedding_near_dup_pairs(df, threshold=0.95).collect()
    }
    assert grid == brute
    assert (0, 100) in grid and (17, 101) in grid


def test_grid_near_dup_plan_is_equi_join(spark):
    vecs = [(i, [float(i), 1.0, 0.5]) for i in range(10)]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    plan = (
        similarity.grid_near_dup_pairs(df, threshold=0.95)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_grid_near_dup_star_equals_all_without_near_identical_mass(spark):
    # on a corpus whose only near-dups are jitter pairs (each pair shares a
    # fine group), star emits exactly the all-pairs result: jitter pairs
    # surface as member->rep, everything else is its own representative
    import random

    rng = random.Random(7)
    vecs = []
    for i in range(40):
        vecs.append((i, [rng.uniform(-1, 1) for _ in range(16)]))
    for src, nid in ((0, 100), (17, 101)):
        base = vecs[src][1]
        vecs.append(
            (nid, [x * (1 + 0.001 * ((k % 5) - 2)) for k, x in enumerate(base)])
        )
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    star = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in similarity.grid_near_dup_pairs(
            df, threshold=0.95, candidates="star"
        ).collect()
    }
    allp = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in similarity.grid_near_dup_pairs(df, threshold=0.95).collect()
    }
    assert star == allp and (0, 100) in star


def test_grid_near_dup_star_linear_on_hot_cluster(spark):
    # 30 hot jitters of one template + 10 spread vectors: all-pairs emits
    # the quadratic C(30+1, 2) hot component; star emits O(members) —
    # every hot member against the min-id representative — and keeps the
    # component connected (every hot id appears in some surviving pair)
    hot = [
        (
            200 + i,
            [
                (1.0 + 0.01 * k) * (1 + 0.0001 * ((i * 7 + k) % 5 - 2))
                for k in range(16)
            ],
        )
        for i in range(30)
    ]
    cold = [
        (i, [float((i * 5 + k * 3) % 11) - 5.0 for k in range(16)])
        for i in range(10)
    ]
    df = spark.createDataFrame(hot + cold, ["vec_id", "embedding"])
    star = similarity.grid_near_dup_pairs(
        df, threshold=0.95, candidates="star"
    ).collect()
    allp = similarity.grid_near_dup_pairs(df, threshold=0.95).collect()
    all_ids = {r["id_a"] for r in allp} | {r["id_b"] for r in allp}
    star_ids = {r["id_a"] for r in star} | {r["id_b"] for r in star}
    assert star_ids == all_ids == {200 + i for i in range(30)}
    assert len(allp) == 30 * 29 // 2          # the quadratic component
    assert len(star) < 2 * 30                 # linear in members


def test_grid_near_dup_join_star_matches_through_representative(spark):
    # seen side holds a dup-dense cluster; a new vector near the cluster
    # must still match (through the representative), and the candidate
    # fan-out per new vector is O(seen fine groups), not O(members)
    seen = [
        (
            10 + i,
            [
                (1.0 + 0.01 * k) * (1 + 0.0001 * ((i * 3 + k) % 5 - 2))
                for k in range(16)
            ],
        )
        for i in range(20)
    ]
    new = [(500, [(1.0 + 0.01 * k) * 1.0001 for k in range(16)]),
           (501, [float(k % 3) - 1.0 for k in range(16)])]
    sdf = spark.createDataFrame(seen, ["vec_id", "embedding"])
    ndf = spark.createDataFrame(new, ["vec_id", "embedding"])
    star = similarity.grid_near_dup_join(
        ndf, sdf, threshold=0.95, candidates="star"
    ).collect()
    matched = {r["id_a"] for r in star}
    assert matched == {500}           # the near vector matches, the far one not
    assert all(r["id_b"] == 10 for r in star)  # through the min-id rep only
