"""A/B the trainer pts-caching postures (r12): ``clustering._PERSIST_PTS``
and ``pq._PERSIST_PTS`` are module flags read at call time, so one process
can interleave the cached and uncached variants per query (the ab_shj.py
discipline — JVM and codegen state symmetric between variants,
same-process pairs per REPRO.md). Both flags toggle together; each query
routes through at most one of the two trainers. Asserts the query RESULT
is identical under both settings (sorted-row hash) before timing:
persist/localCheckpoint must not change fixed-point values.

Usage: python tools/ab_kmeans_cache.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from ideafast_etl_spark.operators import clustering, pq  # noqa: E402
from ideafast_etl_spark.session import get_spark  # noqa: E402


def _set_cache(on: bool) -> None:
    clustering._PERSIST_PTS = on
    pq._PERSIST_PTS = on

# Every declared query that routes through kmeans_fit's training loop.
DEFAULT_QUERIES = [
    "embedding_topk_ivf",
    "kmeans_embeddings",
    "semantic_dedup",
]


def result_hash(df) -> str:
    rows = sorted(tuple(str(v) for v in r) for r in df.collect())
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT_QUERIES
    rounds = 5
    spark = get_spark("ab_kmeans_cache")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = entrymod.queries()
    for name in names:
        fn = qs[name]
        _set_cache(False)
        h_off = result_hash(fn(spark, sf_dir))
        _set_cache(True)
        h_on = result_hash(fn(spark, sf_dir))
        if h_off != h_on:
            print(f"RESULT {name}: MISMATCH off={h_off} on={h_on}")
            continue
        times: dict[bool, list[float]] = {False: [], True: []}
        for i in range(rounds + 1):
            # alternate within-pair order so monotone box drift cancels
            order = (False, True) if i % 2 == 0 else (True, False)
            for setting in order:
                _set_cache(setting)
                t0 = time.monotonic()
                fn(spark, sf_dir).count()
                dt = time.monotonic() - t0
                if i > 0:
                    times[setting].append(dt)
        off_med = statistics.median(times[False])
        on_med = statistics.median(times[True])
        print(
            f"RESULT {name}: off(no cache) median {off_med:.3f}s "
            f"min {min(times[False]):.3f}s | on(persist+ckpt) median "
            f"{on_med:.3f}s min {min(times[True]):.3f}s "
            f"| ratio {on_med / off_med:.3f} | hash {h_off}"
        )
    _set_cache(True)


if __name__ == "__main__":
    main()
