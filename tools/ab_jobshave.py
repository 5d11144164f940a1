"""A/B the r12 loop job-shave postures (same-process pairs, REPRO.md):

- ``bpe``: tokenizer._EAGER_MERGE_CKPT — old form eagerly checkpoints the
  merged vocab every BPE iteration (2 jobs/merge); new form checkpoints
  lazily so the next merge's top-pair collect materializes it (1 job).
- ``cc``: dedup._FUSED_CC_CHANGE — old form detects convergence by
  re-joining new labels to old labels per iteration; new form folds the
  change flag into the label-update projection (min-label propagation is
  monotone, so ``new != old`` iff ``neighbour_min < old``).
- ``star``: similarity._PERSIST_STAR_REPS — new form persists the
  grid-star representative relation across its three consumers (and the
  fine-keyed corpus relation across its two) instead of re-planning a
  corpus-sized sort-aggregate per consumer.
- ``perdoc``: dedup._PERSIST_PER_DOC — new form persists the minhash
  doc-keyed signature/size aggregate across the banding branch and both
  size-lookup branches.
- ``simhash``: dedup._PERSIST_SIMHASH_FP — new form persists the
  simhash fingerprint relation across the banded consumers.

All changes are value-free by construction (caching/checkpoint
eagerness never changes data; the CC flag is an equivalent predicate);
the harness asserts the query RESULT hash is identical under both
settings before timing, and reports Spark jobs/run alongside the
medians (the box-independent structural metric from bench.py).

Usage: python tools/ab_jobshave.py <change> [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from ideafast_etl_spark.operators import (  # noqa: E402
    classifier,
    dedup,
    ivfpq,
    similarity,
    tokenizer,
)
from ideafast_etl_spark.session import get_spark  # noqa: E402

# change -> (module, flag, value_for_NEW_variant, default queries)
CHANGES = {
    "bpe": (
        tokenizer,
        "_EAGER_MERGE_CKPT",
        False,
        ["bpe_train_merges", "bpe_token_counts"],
    ),
    "cc": (
        dedup,
        "_FUSED_CC_CHANGE",
        True,
        ["near_dup_clusters", "near_dup_clusters_star", "leakage_safe_splits"],
    ),
    "star": (
        similarity,
        "_PERSIST_STAR_REPS",
        True,
        ["embedding_near_dup_star"],
    ),
    "perdoc": (
        dedup,
        "_PERSIST_PER_DOC",
        True,
        ["minhash_near_dup", "minhash_near_dup_star"],
    ),
    "simhash": (
        dedup,
        "_PERSIST_SIMHASH_FP",
        True,
        ["simhash_near_dup", "simhash_near_dup_star"],
    ),
    # r13: hot-split member relation persisted across the split's six
    # passes (run at sf0.01 / the 100x harness dirs — the hotsplit query
    # is ~12 s/run at sf0.1)
    "hotmem": (
        ivfpq,
        "_PERSIST_HOT_MEMBERS",
        True,
        ["embedding_topk_ivfpq_hotsplit"],
    ),
    # r13: classifier feature relation persisted across train+score
    # (False reproduces the plain composed form)
    "clf": (
        classifier,
        "_PERSIST_FEATS",
        True,
        ["quality_classifier_scores"],
    ),
}


def result_hash(df) -> str:
    rows = sorted(tuple(str(v) for v in r) for r in df.collect())
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main() -> None:
    change = sys.argv[1]
    module, flag, new_val, default_queries = CHANGES[change]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or default_queries
    rounds = 5
    spark = get_spark(f"ab_jobshave_{change}")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = entrymod.queries()
    tracker = spark.sparkContext.statusTracker()

    def set_new(on: bool) -> None:
        setattr(module, flag, new_val if on else (not new_val))

    for name in names:
        fn = qs[name]
        set_new(False)
        h_old = result_hash(fn(spark, sf_dir))
        set_new(True)
        h_new = result_hash(fn(spark, sf_dir))
        if h_old != h_new:
            print(f"RESULT {name}: MISMATCH old={h_old} new={h_new}", flush=True)
            continue
        times: dict[bool, list[float]] = {False: [], True: []}
        jobs: dict[bool, list[int]] = {False: [], True: []}
        for i in range(rounds + 1):
            # alternate within-pair order so monotone box drift cancels
            order = (False, True) if i % 2 == 0 else (True, False)
            for setting in order:
                set_new(setting)
                j0 = max(tracker.getJobIdsForGroup(), default=0)
                t0 = time.monotonic()
                fn(spark, sf_dir).count()
                dt = time.monotonic() - t0
                j1 = max(
                    spark.sparkContext.statusTracker().getJobIdsForGroup(),
                    default=0,
                )
                if i > 0:
                    times[setting].append(dt)
                    jobs[setting].append(j1 - j0)
        old_med = statistics.median(times[False])
        new_med = statistics.median(times[True])
        print(
            f"RESULT {name}: old median {old_med:.3f}s "
            f"min {min(times[False]):.3f}s jobs {statistics.median(jobs[False])} "
            f"| new median {new_med:.3f}s min {min(times[True]):.3f}s "
            f"jobs {statistics.median(jobs[True])} "
            f"| ratio {new_med / old_med:.3f} | hash {h_old}",
            flush=True,
        )
        set_new(True)


if __name__ == "__main__":
    main()
