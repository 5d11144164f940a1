"""Bounded diagnostics for data-driven posture selection (r11 verdict
#2).

The ``candidates="auto"`` postures (MinHash/SimHash banding in
``dedup``, the grid family in ``similarity``) decide all-pairs vs star
from ONE statistic: the bucket self-join candidate volume
Σ_buckets C(c, 2). r9-r11 computed it exactly with a full keyed
aggregation over the bucket relation — linear, but on the embedding
family that means re-normalizing every vector a second time, and the
measured cost was up to ~2.4× the selected posture's own runtime
(SCALE.md r11). The decision doesn't need the exact value: it is a
threshold test with an orders-of-magnitude margin (a dup-dense corpus
inflates the quadratic term by 100-10000×), so a bounded sample
estimates the same decision at a fraction of the cost.

Sampling design — sample DOCUMENTS, not buckets, with a deterministic
hash: keep ids where ``pmod(xxhash64(id), s) == 0`` (a 1/s Bernoulli
coupling). Each unordered pair inside a bucket survives with
probability 1/s², so ``s² · Σ C(c_sampled, 2)`` is an unbiased
estimator of the true volume. Deterministic hashing keeps the decision
reproducible run-to-run (no seed state, no Date/random), and the filter
sits UNDER the bucket-key projection, so the skipped rows never pay the
normalization / banding arithmetic — Catalyst pushes the id filter to
the scan. Exact below ``sample_target`` rows: small corpora (every unit
fixture) keep bit-identical decisions with r11.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def estimate_bucket_pair_volume(
    rel: DataFrame,
    key_cols: list[str],
    sample_col: str,
    sample_target: int = 65536,
) -> tuple[float, float]:
    """(estimated Σ_buckets C(c, 2), total rows of ``rel``).

    Exact when ``rel`` has ≤ ``sample_target`` rows; above that, a
    deterministic 1-in-s hash sample of ``sample_col`` values with the
    1/s² pair-survival correction (module docstring). Two bounded jobs:
    a column-pruned count and the sampled keyed aggregation — the
    second touches ~``sample_target`` rows regardless of corpus size."""
    n = float(rel.select(sample_col).count())
    s = max(1, math.ceil(n / max(sample_target, 1)))
    sampled = rel
    if s > 1:
        sampled = rel.filter(
            F.pmod(F.xxhash64(F.col(sample_col)), F.lit(s)) == 0
        )
    row = (
        sampled.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs"))
        .first()
    )
    pairs = float(row["pairs"] or 0.0)
    return pairs * s * s, n
