"""IVF-PQ composite (operators/ivfpq.py): recall against brute force on
clustered data, determinism under repartitioning, planted near-dup."""

import numpy as np
from pyspark.sql import functions as F

from ideafast_etl_spark.operators import ivfpq, similarity


def _corpus(rng, n=40, dim=8):
    base = np.eye(4, dim) * 10.0
    rows = []
    for i in range(n):
        rows.append((i, base[i % 4] + rng.normal(0, 0.8, dim)))
    rows.append((100, rows[0][1] + 1e-4))  # near-dup of id 0
    return rows


def _df(spark, rows):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_ivfpq_retrieves_planted_near_dup(spark):
    rng = np.random.default_rng(9)
    df = _df(spark, _corpus(rng))
    out = ivfpq.ivfpq_topk(
        df, df.filter(F.col("vec_id") == 0), k=3, n_cells=4, n_probe=2
    ).collect()
    assert out[0]["neighbor_id"] == 100  # identical cell + identical codes


def test_ivfpq_recall_vs_brute_force(spark):
    rng = np.random.default_rng(17)
    rows = _corpus(rng)
    df = _df(spark, rows)
    q = df.filter(F.col("vec_id") < 3)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(df, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivfpq.ivfpq_topk(
            df, q, k=5, n_cells=4, n_probe=2
        ).collect()
    }
    # cluster-structured corpus + 2/4 probes: expect >= 60% overlap
    assert len(exact & approx) >= 0.6 * len(exact)


def test_ivfpq_deterministic_under_repartition(spark):
    rng = np.random.default_rng(23)
    rows = _corpus(rng)
    df = _df(spark, rows)
    q = df.filter(F.col("vec_id") < 2)
    a = sorted(map(tuple, ivfpq.ivfpq_topk(df, q, k=4, n_cells=4).collect()))
    b = sorted(
        map(
            tuple,
            ivfpq.ivfpq_topk(df.repartition(9), q, k=4, n_cells=4).collect(),
        )
    )
    assert a == b


def test_ivfpq_rejects_indivisible_dim(spark):
    import pytest

    df = _df(spark, [(0, np.ones(6))])
    with pytest.raises(ValueError):
        ivfpq.ivfpq_topk(df, df, m=4)
