"""Scale validation harness (SCALE.md): replicate sf0.1 at 10x/100x with
shifted keys into a realistic multi-file layout, then warm-time the headline
operators on it. Usage:

    python tools/scale_check.py [factor] [dest_dir] [query,query,...] [flags]

Flags:
  --skew   generate with Zipf-style hot keys (r7 verdict directive 1): the
           uniform replication harness keeps every shuffle key uniform, so
           it can never exercise AQE's skew handling or expose a
           degenerate-key window. Skew mode remaps ~30% of rows onto ONE
           global hot key after replication — events.user_id,
           lineitem.l_suppkey and orders.o_custkey — so the hot key's share
           holds at ANY factor (a planted power-law head, the worst case a
           Zipf(1) key distribution converges to). Default query list
           narrows to SKEW_QUERIES (the operators keyed on those columns;
           document/embedding operators don't read them and would time
           identically).
  --plan   after timing each query, report whether the executed adaptive
           plan contains `skew=true` (AQE's skew-split marker) — the proof
           the split fires on a REAL query, not just the planted unit test
           (tests/test_aqe_skew_join.py).
  --aqe-scaled  scale AQE's skew byte thresholds to the harness volume
           (32 MB floor / 16 MB advisory instead of 256 MB / 64 MB; the
           5.0x-median factor criterion stays at its default). At harness
           scale the hot partition lands at ~100-200 MB — pathological
           relative to its ~3 MB peers (factor 50x+) but below the
           production byte floor, so the split never engages; on a real
           100 TB cluster the same 30% hot key is GBs and trips the
           defaults. This flag reproduces the production geometry, exactly
           as SCALE.md's AQE threshold recipe prescribes (and disables
           broadcast for the probe, since a broadcast join has no skewed
           shuffle to split).
  --timeout=SECS  per-query wall budget via job-group cancellation; for
           sweep sets that include queries EXPECTED to be pathological
           (the quadratic-output dedup baselines under --dup-skew at
           100x) so the overrun is recorded instead of hanging the box.
  --doc-skew  generate with ROW-SIZE skew (the third skew axis after key
           frequency and duplicate density): ~1% of documents are inflated
           to ~500x their length (the body repeated — a crawl's runaway
           page / log dump / concatenated boilerplate). Key-uniform
           shuffles can't see this pathology: the unit of work the engine
           cannot split is the single giant ROW, which explodes into one
           task's worth of token/window/shingle rows and then sorts inside
           one per-doc window partition. Default query list narrows to
           DOCSKEW_QUERIES (the per-token text family); pair with
           tools/task_skew_probe.py on the generated dir to read max-task
           rather than wall clock.

(defaults: 10x, /tmp/sfx1, the full QUERIES list; generation is skipped if
dest exists). Scale-posture variants (names ending in ``_hll`` / ``_auto``)
exist only here: they time the documented production path of operators whose
registered query pins a parameter for oracle determinism (exact NDV, fixed
k) — the 100 TB answer is the variant, the oracle answer is the original."""

from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from ideafast_etl_spark import tables  # noqa: E402
from ideafast_etl_spark.session import DEFAULT_CPUS, get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"

QUERIES = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q18_large_orders",
    "tpch_q21_waiting_suppliers",
    "hash_dedup_anti_join",
    "day_window_grouping",
    "sessionization",
    "dreem_pipeline_e2e",
    "exact_dedup",
    "minhash_near_dup",
    "embedding_topk",
    "text_stats",
    "decontaminate_ngrams",
    "repetition_stats",
    "lang_temperature_sample",
    "zorder_curve",
    # round-5 operators
    "ngram_lm_perplexity",
    "kneser_ney_perplexity",
    "span_dedup",
    "substring_dup_spans",
    "dsir_selection",
    "bloom_decontaminate",
    "token_budget_mix",
    "quality_classifier_scores",
    # round-5 additions (cleaning / ranking / graph / analytics)
    "gopher_quality",
    "c4_line_filter",
    "pii_redaction",
    "line_dedup_first_wins",
    "doc_chunks",
    "embedding_topk_pq",
    "order_value_percentiles",
    "order_status_pivot",
    "supplier_pagerank",
    "event_funnel",
    "ccnet_perplexity_buckets",
    "per_lang_sample",
    "embedding_topk_ivfpq",
    "char_entropy",
    "kmv_distinct_users",
    "kmv_click_purchase_overlap",
    "event_value_histogram",
    "price_quantity_regression",
    "corpus_prep_e2e",
    # round-6 operators
    "timeseries_gapfill",
    "event_transition_matrix",
    "fuzzy_name_pairs",
    "time_weighted_avg",
    "event_anomaly_zscore",
    "analyze_table_stats",
    "incremental_revenue_mv",
    "supplier_reachability",
    "value_equidepth_histogram",
    "key_skew_report",
    "cusum_drift",
    "rolling_zscore_anomaly",
    "value_distribution_drift",
    "event_gaps_report",
    # round-7 operators
    "hybrid_retrieval_rrf",
    "scd2_point_in_time_join",
    "leakage_safe_splits",
]


# The dedup family's own skew axis is DUPLICATE DENSITY, not join-key
# frequency (r8 verdict #3): --dup-skew plants ~30% of documents as one
# near-dup template cluster (shared 80-word template + 3 doc-unique
# words → pairwise Jaccard ≈ 0.87, shared band keys) and ~30% of
# embeddings as jittered copies of one template vector (cosine ≈ 1).
# Expected outcomes, measured by DUP_QUERIES: the all-pairs band join
# is quadratic in the hot cluster (the TRUE pair output itself is
# C(0.3n, 2) — unrunnable by construction, not by defect); the *_star
# posture bounds candidates per bucket at O(members); semantic_dedup's
# max_cluster_size sub-blocking bounds the pairwise stage.
DUP_QUERIES = [
    "exact_dedup",
    "minhash_near_dup_star",
    "simhash_near_dup_star",
    "near_dup_clusters_star",
    "embedding_near_dup_star",
    "embedding_near_dup_auto",
    "semantic_dedup",
    "semantic_dedup_auto",
    # the quadratic-output baselines go last: at higher factors they are
    # EXPECTED to be killed/timed out by the operator's own cost
    "minhash_near_dup",
    "simhash_near_dup",
    "embedding_near_dup",
]

# The per-token text family — the operators whose work is proportional to
# DOCUMENT LENGTH, not document count: explodes into token/window/line/
# shingle rows, per-doc windows (gaps-and-islands, entropy, repetition
# tops), per-doc aggregations. The default sweep set under --doc-skew.
# Giant docs cannot be split by any shuffle/AQE trick — the row is the
# atom — so what these measure is whether per-doc work stays O(doc_len)
# (and the harness probe: how big the largest single task gets).
DOCSKEW_QUERIES = [
    "text_stats",
    "lang_id",
    "gopher_quality",
    "c4_line_filter",
    "pii_scrub",
    "char_entropy",
    "line_dedup_first_wins",
    "doc_chunks",
    "repetition_stats",
    "bpe_token_counts",
    "ngram_lm_perplexity",
    "kneser_ney_perplexity",
    "ccnet_perplexity_buckets",
    "dsir_selection",
    "substring_dup_spans",
    "span_dedup",
    "minhash_near_dup",
    "exact_dedup",
    "curriculum_packing",
    "corpus_prep_e2e",
]

# Queries that read the skewed keys (user_id / l_suppkey / o_custkey and
# the joins above them) — the default sweep set under --skew.
SKEW_QUERIES = [
    "sessionization",
    "day_window_grouping",
    "event_funnel",
    "event_transition_matrix",
    "time_weighted_avg",
    "timeseries_gapfill",
    "cusum_drift",
    "event_gaps_report",
    "purchase_attribution",
    "funnel_latency_percentiles",
    "key_skew_report",
    "tpch_q3_shipping_priority",
    "tpch_q18_large_orders",
    "tpch_q21_waiting_suppliers",
    "supplier_pagerank",
    "supplier_reachability",
    "shipment_concurrency_by_month",
    "hash_dedup_anti_join",
    "dreem_pipeline_e2e",
]

# ~30% of rows land on one global hot key. The selector hashes a row-unique
# column (deterministic, replica-independent), so the hot share holds at
# every factor; the hot key is id 1 (present in every dim table's replica 0,
# preserving referential integrity).
_HOT_NUM, _HOT_DEN, _HOT_KEY = 3, 10, 1


def _skew_remap(key_col: str, selector_col: str):
    def extra(p):
        return p.withColumn(
            key_col,
            F.when(
                F.pmod(F.xxhash64(F.col(selector_col)), F.lit(_HOT_DEN))
                < _HOT_NUM,
                F.lit(_HOT_KEY).cast(p.schema[key_col].dataType),
            ).otherwise(F.col(key_col)),
        )
    return extra


_DUP_TEMPLATE = " ".join(f"dupword{i}" for i in range(80))


def _dup_doc_remap(p):
    """~30% of documents (by row-hash, replica-independent) become near
    copies of ONE global template: the shared 80-word body plus 3
    doc-unique words keeps pairwise Jaccard ≈ 0.87 (near-dup, not exact)
    while the hot cluster's members share most band keys — the
    degenerate duplicate-density pathology. Applied AFTER the replica
    word-suffix perturbation so the cluster is global across replicas."""
    uniq = F.concat_ws(
        " ",
        F.concat(F.lit("u"), (F.col("doc_id") * 3).cast("string")),
        F.concat(F.lit("u"), (F.col("doc_id") * 3 + 1).cast("string")),
        F.concat(F.lit("u"), (F.col("doc_id") * 3 + 2).cast("string")),
    )
    return p.withColumn(
        "text",
        F.when(
            F.pmod(F.xxhash64(F.col("doc_id")), F.lit(_HOT_DEN)) < _HOT_NUM,
            F.concat(F.lit(_DUP_TEMPLATE + " "), uniq),
        ).otherwise(F.col("text")),
    )


# --doc-skew: 1% of documents inflated ~500x (selector hashes doc_id, so
# the share holds at any factor and the same base docs are giant in every
# replica — after key shifting each replica's giant is a distinct doc).
_GIANT_NUM, _GIANT_DEN, _GIANT_REPEAT = 1, 100, 500


def _giant_doc_remap(p):
    """Row-size skew plant: the selected documents' text becomes the
    original body repeated ``_GIANT_REPEAT`` times (~500x length — a
    runaway crawl page). Repetition (rather than synthetic filler) keeps
    the giant realistic for dedup operators: its DISTINCT shingle set
    stays small (it IS maximally self-duplicated text), so set-based
    operators should stay flat while per-token/per-window operators carry
    the full inflated row count. n_chars is recomputed so length-reading
    queries (curriculum_packing) see the true size."""
    return p.withColumn(
        "text",
        F.when(
            F.pmod(F.xxhash64(F.col("doc_id")), F.lit(_GIANT_DEN))
            < _GIANT_NUM,
            F.array_join(
                F.array_repeat(F.col("text"), _GIANT_REPEAT), " "
            ),
        ).otherwise(F.col("text")),
    ).withColumn("n_chars", F.length("text"))


def _dup_vec_remap(dim: int):
    """~30% of embeddings become tiny deterministic jitters of one
    template vector (cosine between any two hot vectors ≈ 1 ≥ every
    semantic-dedup threshold) — the embedding-side duplicate-density
    plant."""
    def extra(p):
        jit = [
            F.pmod(F.xxhash64(F.col("vec_id") * 131 + i), F.lit(1000))
            .cast("double") / 1e6
            for i in range(dim)
        ]
        hot_vec = F.array(
            *[F.lit(1.0 + 0.01 * i) + jit[i] for i in range(dim)]
        )
        return p.withColumn(
            "embedding",
            F.when(
                F.pmod(F.xxhash64(F.col("vec_id")), F.lit(_HOT_DEN))
                < _HOT_NUM,
                hot_vec.cast(p.schema["embedding"].dataType),
            ).otherwise(F.col("embedding")),
        )
    return extra


def generate(spark, dst: str, k: int, skew: bool = False,
             dup_skew: bool = False, doc_skew: bool = False) -> None:
    def read(name):
        return tables.load(spark, name, SRC)

    mx: dict[str, int] = {}
    for t, c in [
        ("customer", "c_custkey"), ("orders", "o_orderkey"),
        ("part", "p_partkey"), ("supplier", "s_suppkey"),
        ("documents", "doc_id"), ("embeddings", "vec_id"),
        ("events", "event_id"),
    ]:
        mx[c] = read(t).agg(F.max(c)).first()[0] + 1
    mx["o_custkey"] = mx["c_custkey"]
    mx["l_orderkey"] = mx["o_orderkey"]
    mx["l_partkey"] = mx["p_partkey"]
    mx["l_suppkey"] = mx["s_suppkey"]
    mx["user_id"] = read("events").agg(F.max("user_id")).first()[0] + 1

    # replication via crossJoin with a k-row replica index — ONE vectorized
    # pass per table (a k-way union builds a k-branch plan that optimizes
    # and writes an order of magnitude slower at k=100)
    rep = None

    def shifted(name, keycols, extra=None, nfiles=32):
        df = read(name)
        cols = df.columns
        p = df.crossJoin(F.broadcast(rep))
        for c in keycols:
            p = p.withColumn(c, F.col(c) + F.col("__rep") * F.lit(mx[c]))
        if extra:
            p = extra(p)
        p.select(*cols).repartition(nfiles).write.mode("overwrite").parquet(
            f"{dst}/{name}.parquet"
        )

    rep = spark.range(k).select(F.col("id").alias("__rep"))
    nf = 32 if k <= 10 else 64

    for t in ("region", "nation"):
        read(t).write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
    shifted("customer", ["c_custkey"], nfiles=nf)
    shifted("supplier", ["s_suppkey"], nfiles=nf)
    shifted("part", ["p_partkey"], nfiles=nf)
    shifted(
        "orders", ["o_orderkey", "o_custkey"],
        extra=_skew_remap("o_custkey", "o_orderkey") if skew else None,
        nfiles=nf,
    )
    shifted(
        "lineitem", ["l_orderkey", "l_partkey", "l_suppkey"],
        extra=_skew_remap("l_suppkey", "l_orderkey") if skew else None,
        nfiles=2 * nf,
    )
    # Replica perturbation (r7): suffix EVERY word with the replica index.
    # Within a replica the corpus keeps the original near-dup structure
    # exactly (Jaccard between two docs is invariant under a bijective
    # word rename), while cross-replica shingle overlap drops to ~zero —
    # so the kx corpus is k independent corpora at the ORIGINAL dup
    # density, and pair-output operators (minhash, ngram-jaccard) are
    # expected to scale linearly. The previous tail-marker perturbation
    # left replicas of the same doc ~identical, making the TRUE pair
    # output C(k,2) per doc — at 100x that is legitimate-but-quadratic
    # output growth that says nothing about operator scaling.
    def _doc_suffix(p):
        return p.withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(
                        w, F.lit("~"), F.col("__rep").cast("string")
                    ),
                ),
                " ",
            ),
        )

    if dup_skew:
        doc_extra = lambda p: _dup_doc_remap(_doc_suffix(p))  # noqa: E731
    elif doc_skew:
        doc_extra = lambda p: _giant_doc_remap(_doc_suffix(p))  # noqa: E731
    else:
        doc_extra = _doc_suffix
    shifted("documents", ["doc_id"], extra=doc_extra, nfiles=nf)
    if dup_skew:
        dim = len(read("embeddings").select("embedding").first()[0])
        shifted("embeddings", ["vec_id"], extra=_dup_vec_remap(dim), nfiles=nf)
    else:
        shifted("embeddings", ["vec_id"], nfiles=nf)
    shifted(
        "events", ["event_id", "user_id"],
        extra=_skew_remap("user_id", "event_id") if skew else None,
        nfiles=nf,
    )


def _stats_hll(spark, sf_dir):
    from ideafast_etl_spark.operators.stats import table_stats

    li = tables.load(spark, "lineitem", sf_dir)
    return table_stats(
        li,
        ["l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag", "l_linestatus"],
        exact=False,
    )


def _semantic_dedup_auto(spark, sf_dir):
    from ideafast_etl_spark.operators.clustering import semantic_dedup

    emb = tables.load(spark, "embeddings", sf_dir)
    return semantic_dedup(emb, k=None, iters=4, threshold=0.9)


def _dreem_e2e_bucketed(spark, sf_dir):
    from ideafast_etl_spark.queries import _dreem_e2e

    return _dreem_e2e(spark, sf_dir, bucket_days=30)


# production-posture twins of oracle-pinned queries (see module docstring)
def _ivfpq_hotsplit_auto(spark, sf_dir):
    """r10: the hot-cell sub-split with the corpus-relative cap — the
    production posture (the registered query pins cap=64 so the sf0.01
    oracle exercises the split CTEs; at 100× that absolute cap splits
    every cell and costs 3× on uniform corpora — this variant times the
    documented `max_cell_size="auto"` path instead)."""
    from pyspark.sql import functions as F

    from ideafast_etl_spark.operators.ivfpq import ivfpq_topk

    emb = tables.load(spark, "embeddings", sf_dir)
    return ivfpq_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=5, n_probe=3,
        max_cell_size="auto",
    )


def _embedding_near_dup_auto(spark, sf_dir):
    """r11: the grid near-dup family's data-driven posture gate
    (candidates='auto', similarity._auto_grid_candidates) — one bounded
    diagnostic agg over the home-cell counts picks all on uniform
    corpora and star on dup-dense ones. This variant times the
    production path on both sweep axes: on --dup-skew it must track
    embedding_near_dup_star's cost (not the quadratic baseline's), on
    uniform it must track embedding_near_dup's."""
    from ideafast_etl_spark.operators import similarity
    from ideafast_etl_spark.queries import _augmented_embeddings

    emb = tables.load(spark, "embeddings", sf_dir)
    return similarity.grid_near_dup_pairs(
        _augmented_embeddings(emb), threshold=0.95, candidates="auto"
    )


SCALE_VARIANTS = {
    "analyze_table_stats_hll": _stats_hll,
    "semantic_dedup_auto": _semantic_dedup_auto,
    # r11: grid near-dup auto posture gate
    "embedding_near_dup_auto": _embedding_near_dup_auto,
    # r9: interval join with (device, 30-day-bucket) windows — the skewed
    # sweep's hot-device answer for the last single-task window
    "dreem_pipeline_e2e_bucketed": _dreem_e2e_bucketed,
    # r10: IVF-PQ hot-cell sub-split, corpus-relative cap
    "embedding_topk_ivfpq_hotsplit_auto": _ivfpq_hotsplit_auto,
}


def main() -> None:
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    skew = "--skew" in flags
    dup_skew = "--dup-skew" in flags
    doc_skew = "--doc-skew" in flags
    show_plan = "--plan" in flags
    aqe_scaled = "--aqe-scaled" in flags
    # --timeout=SECS: per-query wall budget enforced by job-group
    # cancellation. Exists for the queries the sweep EXPECTS to be
    # pathological (the quadratic-output dedup baselines at 100x
    # dup-density): the sweep records the overrun as a measured fact
    # instead of hanging the harness.
    timeout_s = None
    for a in flags:
        if a.startswith("--timeout="):
            timeout_s = float(a.split("=", 1)[1])
    # r8 lesson: sweep timings are only comparable from a quiet box — a
    # contended run once mid-round read as a 2x regression that wasn't
    # there. Stamp every run with the load average and refuse to time on
    # a busy box unless --force.
    load1, load5, _ = os.getloadavg()
    ncpu = os.cpu_count() or 1
    print(
        f"# loadavg at start: {load1:.2f} / {load5:.2f} (5 min) on "
        f"{ncpu} cpus",
        flush=True,
    )
    if load1 > 0.25 * ncpu and "--force" not in flags:
        print(
            f"REFUSING: 1-min loadavg {load1:.2f} > 25% of {ncpu} cpus — "
            "timings from a contended box are not comparable across "
            "rounds. Re-run when quiet, or pass --force to proceed "
            "(results will carry the loadavg stamp)."
        )
        sys.exit(2)
    k = int(args[0]) if len(args) > 0 else 10
    dst = args[1] if len(args) > 1 else "/tmp/sfx1"
    names = (
        args[2].split(",")
        if len(args) > 2
        else (
            DUP_QUERIES
            if dup_skew
            else (
                DOCSKEW_QUERIES
                if doc_skew
                else (SKEW_QUERIES if skew else QUERIES)
            )
        )
    )
    # the 100x dataset squeezed through one local JVM needs the resources a
    # cluster run would spread across executors: shuffle partitions sized to
    # the data (so per-task sort/agg state stays bounded — the same rule a
    # real deployment applies) and a heap matching the box. 10x keeps the
    # bench defaults so numbers stay comparable with earlier rounds.
    aqe_conf = (
        {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32MB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16MB",
        }
        if aqe_scaled
        else {}
    )
    if k > 10:
        os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
        spark = get_spark(
            "scale-check",
            shuffle_partitions=4 * DEFAULT_CPUS,
            extra_conf=aqe_conf,
        )
    else:
        spark = get_spark("scale-check", extra_conf=aqe_conf)
    if not os.path.isdir(dst):
        tag = (
            " SKEWED"
            if skew
            else (
                " DUP-DENSE"
                if dup_skew
                else (" GIANT-DOC" if doc_skew else "")
            )
        )
        print(f"# generating {k}x{tag} dataset at {dst}", flush=True)
        generate(
            spark, dst, k, skew=skew, dup_skew=dup_skew, doc_skew=doc_skew
        )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    qs = entrymod.queries()
    qs.update(SCALE_VARIANTS)
    total = 0.0
    for name in names:
        sc = spark.sparkContext
        group = f"scale-{name}"
        cancelled = threading.Event()
        timer = None
        if timeout_s:
            def _cancel(g=group, ev=cancelled):
                ev.set()
                sc.cancelJobGroup(g)

            timer = threading.Timer(timeout_s, _cancel)
            timer.daemon = True
            timer.start()
        sc.setJobGroup(group, name, interruptOnCancel=True)
        t0 = time.time()
        try:
            qs[name](spark, dst).count()  # warm: plan + codegen compiled
            t = time.time()
            # count via an agg we keep a handle on: collect() executes THIS
            # DataFrame's queryExecution, so the post-run adaptive plan
            # (with any skew=true markers) is inspectable — df.count()
            # would execute a separate anonymous execution
            cnt = qs[name](spark, dst).agg(F.count(F.lit(1)).alias("n"))
            n = cnt.collect()[0]["n"]
            dt = time.time() - t
        except Exception as e:
            if cancelled.is_set():
                print(
                    f"{name}: TIMED-OUT >{timeout_s:.0f}s "
                    f"(cancelled at {time.time() - t0:.0f}s wall — the "
                    "measured fact, not a harness defect)",
                    flush=True,
                )
            else:
                print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        finally:
            if timer is not None:
                timer.cancel()
            sc._jsc.clearJobGroup()  # no PySpark-level clearJobGroup
        total += dt
        tag = ""
        if show_plan:
            plan = cnt._jdf.queryExecution().executedPlan().toString()
            tag = "  [skew-split FIRED]" if "skew=true" in plan else "  [no skew-split]"
        print(f"{name}: {dt:.2f}s ({n} rows){tag}", flush=True)
    load1, load5, _ = os.getloadavg()
    print(
        f"total: {total:.2f}s over {len(names)} queries at {k}x sf0.1 "
        f"(loadavg at end: {load1:.2f} / {load5:.2f})"
    )


if __name__ == "__main__":
    main()
