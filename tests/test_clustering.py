"""Deterministic k-means + SemDeDup (operators/clustering.py).

The numpy twin replicates the EXACT arithmetic — left-fold normalization,
HALF_UP fixed-point quantisation, integer dot products, quantised centroid
renormalisation — so assignments and similarities must match bit-for-bit,
not approximately. A second run over a repartitioned input must collect
identical results (the determinism claim under shuffle reordering)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ideafast_etl_spark.operators.clustering import (
    _SCALE,
    kmeans_assign,
    semantic_dedup,
)


def _half_up(v):
    """Spark F.round semantics (HALF_UP, away from zero)."""
    return np.sign(v) * np.floor(np.abs(v) + 0.5)


def _make_corpus(rng):
    """Three well-separated direction clusters in dim 6, plus two near-dup
    pairs (cosine > 0.999) inside cluster 0."""
    base = np.array(
        [[10, 0, 0, 1, 0, 0], [0, 10, 0, 0, 1, 0], [0, 0, 10, 0, 0, 1]],
        dtype=np.float64,
    )
    rows = []
    for i in range(30):
        c = i % 3
        # noise wide enough that ordinary same-cluster pairs stay clearly
        # below the 0.999 near-dup threshold (typical pair angle ~0.4 rad)
        v = base[c] + rng.normal(0, 1.2, 6)
        rows.append((i, v))
    # near-dups of ids 0 and 3 (both cluster 0): tiny perturbations
    rows.append((100, rows[0][1] + 1e-4))
    rows.append((101, rows[3][1] + 1e-4))
    return rows


def _twin(rows, k, iters):
    """Exact numpy replica of kmeans_assign."""
    ids = np.array([r[0] for r in rows])
    vecs = np.array([r[1] for r in rows], dtype=np.float64)
    # float32 ingestion like array<float>, then cast to double
    vecs = vecs.astype(np.float32).astype(np.float64)
    units = []
    for v in vecs:
        acc = 0.0
        for x in v:
            acc = acc + x * x
        units.append(v / np.sqrt(acc))
    units = np.array(units)
    ivals = _half_up(units * _SCALE).astype(np.int64)
    order = np.argsort(ids)
    seeds = order[:k]
    cent = ivals[seeds].copy()  # cid = rank of id
    for _ in range(iters):
        dots = ivals @ cent.T  # exact int64
        sims = dots.astype(np.float64) / (_SCALE * _SCALE)
        assign = np.argmax(sims, axis=1)  # ties → lowest cid (argmax rule)
        new = []
        for c in range(k):
            members = ivals[assign == c]
            if len(members) == 0:
                new.append(cent[c])  # empty cluster keeps its centroid
                continue
            s = members.sum(axis=0)
            mean = s.astype(np.float64) / (len(members) * _SCALE)
            imean = _half_up(mean * _SCALE).astype(np.int64)
            cnorm = np.sqrt(float((imean * imean).sum())) / _SCALE
            new.append(
                _half_up((imean / (cnorm * _SCALE)) * _SCALE).astype(np.int64)
            )
        cent = np.array(new)
    dots = ivals @ cent.T
    sims = dots.astype(np.float64) / (_SCALE * _SCALE)
    assign = np.argmax(sims, axis=1)
    best = sims[np.arange(len(ids)), assign]
    return {
        int(i): (int(c), float(_half_up(s * 1e6) / 1e6))
        for i, c, s in zip(ids, assign, best)
    }


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(42)
    rows = _make_corpus(rng)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    return rows, df


def test_kmeans_matches_numpy_twin_exactly(spark, corpus):
    rows, df = corpus
    got = {
        r["vec_id"]: (r["cluster_id"], r["sim"])
        for r in kmeans_assign(df, k=3, iters=4).collect()
    }
    want = _twin(rows, k=3, iters=4)
    assert got == want  # bit-exact, not approx


def test_kmeans_deterministic_under_repartition(spark, corpus):
    _rows, df = corpus
    a = sorted(
        map(tuple, kmeans_assign(df, k=3, iters=3).collect())
    )
    b = sorted(
        map(tuple, kmeans_assign(df.repartition(7), k=3, iters=3).collect())
    )
    assert a == b


def test_kmeans_recovers_planted_clusters(spark, corpus):
    rows, df = corpus
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in kmeans_assign(df, k=3, iters=4).collect()
    }
    # every planted group lands in one cluster, groups in distinct clusters
    planted = {c: {i for i, _v in rows if i < 30 and i % 3 == c} for c in range(3)}
    labels = {c: {got[i] for i in members} for c, members in planted.items()}
    assert all(len(ls) == 1 for ls in labels.values())
    assert len(set().union(*labels.values())) == 3


def test_semantic_dedup_drops_near_dups_keeps_lowest_id(spark, corpus):
    rows, df = corpus
    got = {
        r["vec_id"]: (r["cluster_id"], r["keep"])
        for r in semantic_dedup(df, k=3, iters=4, threshold=0.999).collect()
    }
    assert len(got) == len(rows)
    # the planted near-dups (100 of 0, 101 of 3) are dropped; originals kept
    assert got[100][1] is False and got[101][1] is False
    assert got[0][1] is True and got[3][1] is True
    # and they were blocked into the same cluster as their originals
    assert got[100][0] == got[0][0]
    assert got[101][0] == got[3][0]
    # nothing outside the planted pairs is dropped at this threshold
    dropped = {i for i, (_c, keep) in got.items() if not keep}
    assert dropped == {100, 101}


def test_derive_k_scales_with_n():
    from ideafast_etl_spark.operators.clustering import derive_k

    assert derive_k(10, 1024) == 1
    assert derive_k(1024, 1024) == 1
    assert derive_k(1025, 1024) == 2
    assert derive_k(10_000_000, 1024) == 9766  # k grows with n, not fixed
    assert derive_k(5, 0) == 5  # degenerate target clamped to 1


def test_auto_k_and_giant_cluster_cap(spark):
    """A planted giant cluster (every vector near-identical) must not
    produce an unbounded pairwise stage: with max_cluster_size=cap the
    candidate-pair count stays <= n*cap/2; uncapped it is n*(n-1)/2."""
    from ideafast_etl_spark.operators.clustering import near_dup_pairs

    n, cap = 30, 5
    rng = np.random.default_rng(11)
    rows = [
        (i, (np.array([10.0, 0, 0, 1, 0, 0]) + rng.normal(0, 1e-3, 6)).tolist())
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assign = kmeans_assign(df, k=1, iters=2)
    uncapped = near_dup_pairs(df, assign).count()
    assert uncapped == n * (n - 1) // 2  # the quadratic stage, made visible
    capped = near_dup_pairs(df, assign, max_cluster_size=cap).count()
    # ceil(30/5)=6 full blocks of C(5,2)=10 pairs
    assert capped == 6 * 10
    assert capped <= n * cap / 2


def test_cluster_sizes_surfaces_skew(spark):
    from ideafast_etl_spark.operators.clustering import cluster_sizes

    rng = np.random.default_rng(3)
    rows = [(i, list(map(float, v))) for i, (_, v) in enumerate(_make_corpus(rng))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assign = kmeans_assign(df, k=3, iters=3)
    sizes = cluster_sizes(assign).collect()
    assert sum(r["n_members"] for r in sizes) == assign.count()
    # ordered worst-first so skew is the first row a report shows
    assert sizes[0]["n_members"] == max(r["n_members"] for r in sizes)


def test_zero_norm_centroid_guard(spark):
    """Two exactly opposite vectors forced into one cluster make the
    quantised centroid mean all zeros; the guard drops that centroid
    instead of emitting Inf/NaN -> null assignments."""
    rows = [(0, [1.0, 0.0]), (1, [-1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_assign(df, k=1, iters=2).collect()
    # graceful degenerate case: no row carries a null/NaN similarity
    for r in out:
        assert r["sim"] is not None and r["sim"] == r["sim"]


def test_semantic_dedup_cap_keeps_lowest_id_semantics(spark):
    """With a cap small enough to split the corpus's clusters, dedup still
    keeps the lowest id of each detected near-dup pair and never drops a
    vector without a surviving lower-id witness."""
    rng = np.random.default_rng(5)
    rows = [(int(i), list(map(float, v))) for i, v in _make_corpus(rng)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(
            df, k=3, iters=4, threshold=0.999, max_cluster_size=64
        ).collect()
    }
    # the planted near-dups 100/101 duplicate ids 0/3 -> dropped; originals kept
    assert out[0] and out[3]
    assert not out[100] and not out[101]


def test_hierarchical_kmeans_planted_dups_and_determinism(spark):
    """The auto-k production path (two-level k-means): identical vectors
    must land in the same (c1, scid) cluster — their per-iteration sims
    tie everywhere and the tie-break is deterministic — so semantic_dedup
    flags planted exact dups; a repartitioned rerun collects identically."""
    from ideafast_etl_spark.operators.clustering import (
        kmeans_assign_hierarchical,
        semantic_dedup,
    )

    rng = np.random.default_rng(3)
    rows = []
    for i in range(400):
        v = rng.normal(0, 1, 6) + np.eye(6)[i % 6] * 8
        rows.append((i, [float(x) for x in v]))
    # planted exact duplicates of ids 0..9
    for j in range(10):
        rows.append((1000 + j, rows[j][1]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # force the hierarchical path with a small target (410 rows, target 32
    # -> k_total=13 > threshold only if > 64... use target 4 -> k=103)
    assign = kmeans_assign_hierarchical(
        df, iters=3, target_cluster_size=4
    )
    a = {r["vec_id"]: r["cluster_id"] for r in assign.collect()}
    assert len(a) == 410
    for j in range(10):
        assert a[j] == a[1000 + j], j  # exact dup shares the cluster

    b = {
        r["vec_id"]: r["cluster_id"]
        for r in kmeans_assign_hierarchical(
            df.repartition(7), iters=3, target_cluster_size=4
        ).collect()
    }
    assert a == b  # bit-deterministic under repartition

    out = semantic_dedup(
        df, iters=3, threshold=0.9999, target_cluster_size=4
    )
    kept = {r["vec_id"]: r["keep"] for r in out.collect()}
    for j in range(10):
        assert kept[j] is True and kept[1000 + j] is False, j


def test_hierarchical_small_corpus_falls_back_to_flat(spark):
    from ideafast_etl_spark.operators.clustering import (
        kmeans_assign,
        kmeans_assign_hierarchical,
    )

    rows = [
        (i, [float(x) for x in np.eye(4)[i % 4] * 5 + 0.1 * i])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # k_total = ceil(40/8) = 5 <= 64: must equal the flat path exactly
    got = sorted(
        map(
            tuple,
            kmeans_assign_hierarchical(
                df, iters=2, target_cluster_size=8
            ).collect(),
        )
    )
    want = sorted(
        map(tuple, kmeans_assign(df, k=5, iters=2).collect())
    )
    assert got == want
