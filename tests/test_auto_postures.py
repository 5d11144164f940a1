"""Auto-selection for the scale-safe postures (r9 verdict #7): the
star/bucketed variants were parameters the caller had to know to set;
the "auto" modes measure the data (one bounded diagnostic agg, the
mmr_rerank loop="auto" pattern) and pick — baseline on uniform input,
the safe variant on planted skew — without changing any result the
baseline would have produced on uniform data, and without running jobs
under plan-audit mode."""

import datetime as dt

from pyspark.sql import functions as F

from ideafast_etl_spark.operators.dedup import (
    minhash_near_dup_pairs,
    simhash_near_dup_pairs,
)
from ideafast_etl_spark.operators.joins import interval_containment_join
from ideafast_etl_spark.plan_audit import no_checkpoints


def _uniform_docs(spark, n=60):
    rows = [
        (i, f"document number {i} about topic {i % 7} with unique tail "
            f"{i * 37} {i * 91} {i * 13}")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _dup_dense_docs(spark, n=60, dup_share=0.5):
    """Half the corpus is one near-identical template cluster."""
    n_dup = int(n * dup_share)
    template = ("terms of service agreement please read carefully "
                "all rights reserved contact support for help now")
    rows = [(i, template + f" v{i % 2}") for i in range(n_dup)]
    rows += [
        (n_dup + i,
         f"document number {i} about topic {i % 7} with unique tail "
         f"{i * 37} {i * 91} {i * 13}")
        for i in range(n - n_dup)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(df):
    return sorted(map(tuple, df.collect()))


def test_minhash_auto_picks_all_on_uniform_star_on_dup_dense(spark):
    uni = _uniform_docs(spark)
    assert _pairs(minhash_near_dup_pairs(uni, candidates="auto")) == _pairs(
        minhash_near_dup_pairs(uni, candidates="all")
    )
    dense = _dup_dense_docs(spark)
    got_auto = _pairs(minhash_near_dup_pairs(dense, candidates="auto"))
    got_star = _pairs(minhash_near_dup_pairs(dense, candidates="star"))
    got_all = _pairs(minhash_near_dup_pairs(dense, candidates="all"))
    assert got_auto == got_star
    assert got_all != got_star  # the gate actually discriminated


def test_simhash_auto_picks_all_on_uniform_star_on_dup_dense(spark):
    uni = _uniform_docs(spark)
    assert _pairs(simhash_near_dup_pairs(uni, candidates="auto")) == _pairs(
        simhash_near_dup_pairs(uni, candidates="all")
    )
    dense = _dup_dense_docs(spark)
    got_auto = _pairs(simhash_near_dup_pairs(dense, candidates="auto"))
    got_star = _pairs(simhash_near_dup_pairs(dense, candidates="star"))
    got_all = _pairs(simhash_near_dup_pairs(dense, candidates="all"))
    assert got_auto == got_star
    assert got_all != got_star


def _interval_data(spark, hot_rows):
    d0 = dt.date(2024, 1, 1)
    asg = [
        ("hot", d0 + dt.timedelta(days=d), d0 + dt.timedelta(days=d + 2), d)
        for d in range(hot_rows)
    ] + [
        ("cold", d0 + dt.timedelta(days=30 * i),
         d0 + dt.timedelta(days=30 * i + 29), 1000 + i)
        for i in range(5)
    ]
    rec = [
        (i, dev, start + dt.timedelta(days=1), start + dt.timedelta(days=1))
        for i, (dev, start, _e, _a) in enumerate(asg)
    ]
    return (
        spark.createDataFrame(
            rec, "rec_id long, device_id string, start date, end date"
        ),
        spark.createDataFrame(
            asg,
            "device_id string, start_wear date, end_wear date, assignment_id long",
        ),
    )


def _ij(records, assignments, **kw):
    return interval_containment_join(
        records,
        assignments,
        record_key="rec_id",
        device_col="device_id",
        payload_cols=("assignment_id",),
        order_cols=("start_wear", "assignment_id"),
        **kw,
    )


def _plan(df):
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_interval_join_auto_bucket_days(spark):
    records, assignments = _interval_data(spark, hot_rows=200)
    want = _pairs(_ij(records, assignments))

    # uniform-ish (below threshold): auto keeps the single-window plan
    calm = _ij(records, assignments, bucket_days="auto",
               auto_device_rows=1000)
    assert "__sb" not in _plan(calm)
    assert _pairs(calm) == want

    # planted hot device (above threshold): auto engages the bucketed
    # decomposition — identical rows, decomposed plan
    hot = _ij(records, assignments, bucket_days="auto",
              auto_device_rows=50)
    assert "__sb" in _plan(hot)
    assert _pairs(hot) == want


def test_auto_modes_run_no_jobs_under_plan_audit(spark):
    """Plan-audit mode: auto must resolve WITHOUT diagnostic jobs and
    pick the scale-safe variant (the mmr loop='auto' r9 ADVICE rule)."""
    docs = _uniform_docs(spark, n=20)
    records, assignments = _interval_data(spark, hot_rows=10)
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    with no_checkpoints():
        mh = minhash_near_dup_pairs(docs, candidates="auto")
        ij = _ij(records, assignments, bucket_days="auto")
        plan_mh = _plan(mh)
        plan_ij = _plan(ij)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before
    assert "__sb" in plan_ij  # scale-safe bucketed plan
    assert "min(" in plan_mh.lower()  # star's bucket-min rep aggregate


def _uniform_vecs(spark, n=60, dim=8):
    import numpy as np

    rng = np.random.default_rng(5)
    base = np.eye(6, dim) * 10.0
    rows = [
        (int(i), [float(x) for x in base[i % 6] + rng.normal(0, 0.8, dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _dup_dense_vecs(spark, n=60, dup_share=0.5, dim=8):
    import numpy as np

    rng = np.random.default_rng(11)
    n_dup = int(n * dup_share)
    hot = np.ones(dim) * 5.0
    rows = [
        (int(i), [float(x) for x in hot + rng.normal(0, 1e-4, dim)])
        for i in range(n_dup)
    ]
    base = np.eye(6, dim) * 10.0
    rows += [
        (int(n_dup + i),
         [float(x) for x in base[i % 6] + rng.normal(0, 0.8, dim)])
        for i in range(n - n_dup)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_grid_auto_picks_all_on_uniform_star_on_dup_dense(spark):
    """r10 verdict #7: the embedding grid near-dup family gets the same
    data-driven auto gate as minhash/simhash — baseline on uniform input
    (identical output), star on planted dup density (with all/star
    provably differing, so the gate discriminated)."""
    from ideafast_etl_spark.operators.similarity import grid_near_dup_pairs

    uni = _uniform_vecs(spark)
    assert _pairs(grid_near_dup_pairs(uni, candidates="auto")) == _pairs(
        grid_near_dup_pairs(uni, candidates="all")
    )
    # 60 near-identical vectors land in one cell: C(60,2)=1770 candidate
    # pairs > 8 * 120 — the diagnostic must flip to star
    dense = _dup_dense_vecs(spark, n=120)
    got_auto = _pairs(grid_near_dup_pairs(dense, candidates="auto"))
    got_star = _pairs(grid_near_dup_pairs(dense, candidates="star"))
    got_all = _pairs(grid_near_dup_pairs(dense, candidates="all"))
    assert got_auto == got_star
    assert got_all != got_star  # the gate actually discriminated


def test_grid_join_auto_measures_the_seen_side(spark):
    from ideafast_etl_spark.operators.similarity import grid_near_dup_join

    new = _uniform_vecs(spark, n=20)
    seen_uni = _uniform_vecs(spark, n=40)
    assert _pairs(
        grid_near_dup_join(new, seen_uni, candidates="auto")
    ) == _pairs(grid_near_dup_join(new, seen_uni, candidates="all"))
    seen_dense = _dup_dense_vecs(spark, n=120)
    got_auto = _pairs(grid_near_dup_join(new, seen_dense, candidates="auto"))
    got_star = _pairs(grid_near_dup_join(new, seen_dense, candidates="star"))
    assert got_auto == got_star


def test_grid_auto_runs_no_jobs_under_plan_audit(spark):
    from ideafast_etl_spark.operators.similarity import grid_near_dup_pairs

    vecs = _uniform_vecs(spark, n=20)
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    with no_checkpoints():
        out = grid_near_dup_pairs(vecs, candidates="auto")
        plan = _plan(out)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before
    # star's fine-group min-id representative aggregate is in the plan
    assert "min(" in plan.lower()


def test_grid_auto_rejects_unknown_mode(spark):
    import pytest

    from ideafast_etl_spark.operators.similarity import grid_near_dup_pairs

    with pytest.raises(ValueError, match="candidates"):
        grid_near_dup_pairs(_uniform_vecs(spark, n=5), candidates="Auto")


def test_sampled_diagnostic_keeps_decisions(spark):
    """r11 verdict #2: above sample_target the posture diagnostics
    estimate Σ C(c,2) from a deterministic 1-in-s doc-hash sample
    instead of an exact full keyed agg. The DECISIONS must match the
    exact path on both fixture shapes (uniform → all, planted dup
    density → star); determinism makes this a stable assertion, not a
    flaky statistical one."""
    from ideafast_etl_spark.operators.dedup import _auto_candidates
    from ideafast_etl_spark.operators.similarity import (
        _auto_grid_candidates,
        _grid_cells,
    )

    # grid family: same relations the operator builds. The uniform side
    # uses well-spread vectors (singleton cells): the module fixture
    # _uniform_vecs is 6 tight clusters whose exact statistic sits just
    # UNDER the 8-pairs-per-doc threshold — a boundary case no estimator
    # (and no real corpus that matters) should be graded on.
    import math

    import numpy as np

    rng = np.random.default_rng(11)
    spread = spark.createDataFrame(
        [
            (int(i), [float(x) for x in rng.normal(0, 10, 8)])
            for i in range(120)
        ],
        "vec_id long, embedding array<float>",
    )
    # ... and the dense side gets a production-like margin: the module's
    # _dup_dense_vecs sits at only ~1.9× the flip threshold (fine for the
    # exact gate, inside sampling noise for the estimator), while a real
    # dup-dense corpus exceeds it by orders of magnitude — which is the
    # regime auto exists for. 80% duplicates gives an ~8× margin.
    dense = _dup_dense_vecs(spark, n=200, dup_share=0.8)
    r = math.sqrt(max(2.0 - 2.0 * 0.95, 1e-12))
    for vecs, want in ((spread, "all"), (dense, "star")):
        u = _grid_cells(vecs, "vec_id", "embedding", r, 3)
        exact = _auto_grid_candidates(u, 3, 8.0)  # n ≤ default target
        sampled = _auto_grid_candidates(u, 3, 8.0, sample_target=32)
        assert exact == sampled == want

    # band-bucket family: synthetic banded relations with controlled
    # bucket structure (the decision only sees (id, band, band_key))
    n_bands = 4
    uniform = spark.createDataFrame(
        [(i, b, f"u{i}b{b}") for i in range(120) for b in range(n_bands)],
        "doc_id long, band int, band_key string",
    )
    dense = spark.createDataFrame(
        [
            (i, b, f"hot{b}" if i < 60 else f"u{i}b{b}")
            for i in range(120)
            for b in range(n_bands)
        ],
        "doc_id long, band int, band_key string",
    )
    for banded, want in ((uniform, "all"), (dense, "star")):
        exact = _auto_candidates(banded, n_bands, 8.0)
        sampled = _auto_candidates(banded, n_bands, 8.0, sample_target=64)
        assert exact == sampled == want


def test_pair_volume_estimator_is_calibrated(spark):
    """The sampled estimator must land in the same decision regime as
    the exact statistic: within a small factor on a hot-bucket relation
    (the case that matters — the margin there is orders of magnitude)
    and near zero on singleton buckets."""
    from ideafast_etl_spark.operators.diag import (
        estimate_bucket_pair_volume,
    )

    hot = spark.createDataFrame(
        [(i, "hot" if i < 400 else f"k{i}") for i in range(800)],
        "id long, key string",
    )
    exact, n = estimate_bucket_pair_volume(hot, ["key"], "id")
    assert n == 800 and exact == 400 * 399 / 2
    est, n2 = estimate_bucket_pair_volume(hot, ["key"], "id", 100)
    assert n2 == 800
    assert exact / 4 < est < exact * 4  # same order of magnitude

    flat = spark.createDataFrame(
        [(i, f"k{i}") for i in range(800)], "id long, key string"
    )
    est_flat, _ = estimate_bucket_pair_volume(flat, ["key"], "id", 100)
    assert est_flat == 0.0
