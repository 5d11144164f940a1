"""Product quantization (operators/pq.py): bit-exact numpy twin for
training/encoding/ADC scoring, determinism under repartitioning, and a
near-dup-retrieval sanity check."""

import numpy as np
from pyspark.sql import functions as F

from ideafast_etl_spark.operators import pq
from ideafast_etl_spark.operators.pq import _SCALE


def _half_up(v):
    return np.sign(v) * np.floor(np.abs(v) + 0.5)


def _make_corpus(rng, n=24, dim=8):
    base = np.array(
        [
            [10, 0, 0, 0, 1, 0, 0, 0],
            [0, 10, 0, 0, 0, 1, 0, 0],
            [0, 0, 10, 0, 0, 0, 1, 0],
        ],
        dtype=np.float64,
    )
    rows = []
    for i in range(n):
        v = base[i % 3] + rng.normal(0, 1.0, dim)
        rows.append((i, v))
    rows.append((100, rows[0][1] + 1e-4))  # near-dup of id 0
    return rows


def _ivals(rows):
    ids = np.array([r[0] for r in rows])
    vecs = np.array([r[1] for r in rows], dtype=np.float64)
    vecs = vecs.astype(np.float32).astype(np.float64)  # array<float> ingest
    units = []
    for v in vecs:
        acc = 0.0
        for x in v:
            acc = acc + x * x
        units.append(v / np.sqrt(acc))
    return ids, _half_up(np.array(units) * _SCALE).astype(np.int64)


def _twin_train_encode(rows, m, k, iters):
    """Exact replica of pq_train + pq_encode. Returns (ids, codes[n, m],
    centroids dict[(sub, cid)] -> int64 subvector)."""
    ids, ivals = _ivals(rows)
    n, dim = ivals.shape
    subdim = dim // m
    order = np.argsort(ids)
    seeds = order[:k]
    # cent[sub][cid] -> subvector or None (dead cluster)
    cent = {
        s: {c: ivals[seeds[c], s * subdim : (s + 1) * subdim].copy() for c in range(k)}
        for s in range(m)
    }

    def assign(sub):
        live = sorted(cent[sub])
        out = np.empty(n, dtype=np.int64)
        for i in range(n):
            sv = ivals[i, sub * subdim : (sub + 1) * subdim]
            best_c, best_d = None, None
            for c in live:
                d = int(((sv - cent[sub][c]) ** 2).sum())
                if best_d is None or d < best_d:  # tie -> lower cid wins
                    best_c, best_d = c, d
            out[i] = best_c
        return out

    for _ in range(iters):
        for s in range(m):
            a = assign(s)
            new = {}
            for c in sorted(cent[s]):
                members = ivals[a == c, s * subdim : (s + 1) * subdim]
                if len(members) == 0:
                    continue  # dead centroid vanishes
                sm = members.sum(axis=0)
                new[c] = _half_up(sm.astype(np.float64) / len(members)).astype(
                    np.int64
                )
            cent[s] = new
    codes = np.column_stack([assign(s) for s in range(m)])
    return ids, codes, cent


def _spark_df(spark, rows):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_pq_codes_match_numpy_twin(spark):
    rng = np.random.default_rng(7)
    rows = _make_corpus(rng)
    df = _spark_df(spark, rows)
    m, k, iters = 4, 4, 3
    cb = pq.pq_train(df, m=m, k=k, iters=iters)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in pq.pq_encode(df, cb, m=m).collect()
    }
    ids, codes, _ = _twin_train_encode(rows, m, k, iters)
    want = {int(i): list(map(int, codes[j])) for j, i in enumerate(ids)}
    assert got == want


def test_pq_topk_matches_twin_scores(spark):
    rng = np.random.default_rng(11)
    rows = _make_corpus(rng)
    df = _spark_df(spark, rows)
    m, k_cb, iters = 4, 4, 3
    out = pq.pq_topk(
        df,
        df.filter(F.col("vec_id") < 2),
        k=5,
        m=m,
        n_centroids=k_cb,
        iters=iters,
    ).collect()
    ids, codes, cent = _twin_train_encode(rows, m, k_cb, iters)
    _, ivals = _ivals(rows)
    n, dim = ivals.shape
    subdim = dim // m
    idx = {int(i): j for j, i in enumerate(ids)}
    for qid in (0, 1):
        qi = ivals[idx[qid]]
        scores = {}
        for j, nid in enumerate(ids):
            if int(nid) == qid:
                continue
            s = 0
            for sub in range(m):
                c = int(codes[j, sub])
                s += int(
                    (qi[sub * subdim : (sub + 1) * subdim] * cent[sub][c]).sum()
                )
            scores[int(nid)] = round(s / (_SCALE * _SCALE), 6)
        want = sorted(scores.items(), key=lambda t: (-t[1], t[0]))[:5]
        got = sorted(
            [
                (r["neighbor_id"], r["approx_sim"], r["rank"])
                for r in out
                if r["query_id"] == qid
            ],
            key=lambda t: t[2],
        )
        assert [(n_, s_) for n_, s_, _ in got] == want


def test_pq_deterministic_under_repartition(spark):
    rng = np.random.default_rng(3)
    rows = _make_corpus(rng)
    df = _spark_df(spark, rows)
    cb1 = pq.pq_train(df, m=4, k=4, iters=2)
    cb2 = pq.pq_train(df.repartition(7), m=4, k=4, iters=2)
    a = sorted(map(tuple, cb1.collect()))
    b = sorted(map(tuple, cb2.collect()))
    assert a == b


def test_pq_retrieves_planted_near_dup(spark):
    rng = np.random.default_rng(5)
    rows = _make_corpus(rng)
    df = _spark_df(spark, rows)
    out = pq.pq_topk(df, df.filter(F.col("vec_id") == 0), k=3).collect()
    # id 100 is a 1e-4 perturbation of id 0 -> identical PQ codes -> rank 1
    assert out[0]["neighbor_id"] == 100


def test_pq_rejects_indivisible_dim(spark):
    df = _spark_df(spark, [(0, np.ones(6))])
    import pytest

    with pytest.raises(ValueError):
        pq.pq_train(df, m=4, k=2, iters=1)
