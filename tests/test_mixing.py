"""Waterfill token-budget allocation (operators/mixing.py): hand-computed
levels, saturation regimes, budget conservation."""

import pytest
from pyspark.sql import functions as F

from ideafast_etl_spark.operators.mixing import waterfill_allocation


def _run(spark, counts, budget, max_epochs=4):
    cdf = spark.createDataFrame(counts, ["source", "tokens"])
    bdf = spark.createDataFrame([(budget,)], ["budget"])
    rows = waterfill_allocation(cdf, bdf, max_epochs=max_epochs).collect()
    return {r.source: r for r in rows}


def test_partial_saturation_hand_computed(spark):
    # caps: a->40, b->400, c->4000; budget 1000:
    # m=1 (saturate a): lam = (1000-40)/2 = 480 >= 40 ok; lam<cap_b? 480>=400
    # -> m=2 saturates b too: lam = (1000-440)/1 = 560 >= 400 ok
    out = _run(spark, [("a", 10), ("b", 100), ("c", 1000)], 1000)
    assert out["a"].allocation == 40.0 and out["a"].epochs == 4.0
    assert out["b"].allocation == 400.0 and out["b"].epochs == 4.0
    assert out["c"].allocation == 560.0
    assert out["c"].epochs == pytest.approx(0.56)
    total = sum(r.allocation for r in out.values())
    assert total == pytest.approx(1000.0)  # budget exactly spent


def test_no_saturation_uniform_level(spark):
    # budget 30 < 3 * min cap (40): everyone at lam = 10
    out = _run(spark, [("a", 10), ("b", 100), ("c", 1000)], 30)
    assert all(r.allocation == 10.0 for r in out.values())


def test_budget_above_capacity_saturates_all(spark):
    out = _run(spark, [("a", 10), ("b", 20)], 10_000)
    assert out["a"].allocation == 40.0 and out["b"].allocation == 80.0
    assert all(r.epochs == 4.0 for r in out.values())


def test_single_source(spark):
    out = _run(spark, [("only", 50)], 120)
    assert out["only"].allocation == 120.0
    assert out["only"].epochs == pytest.approx(2.4)


def test_budget_conservation_random(spark):
    counts = [(f"s{i}", 13 + 37 * i) for i in range(9)]
    budget = 2 * sum(t for _, t in counts)
    out = _run(spark, counts, budget)
    total = sum(r.allocation for r in out.values())
    assert total == pytest.approx(float(budget), rel=1e-9)
    assert all(r.allocation <= r.cap + 1e-9 for r in out.values())
