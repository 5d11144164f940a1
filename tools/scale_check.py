"""Scale validation harness (SCALE.md): replicate sf0.1 at 10x/100x with
shifted keys into a realistic multi-file layout, then warm-time the headline
operators on it. Usage:

    python tools/scale_check.py [factor] [dest_dir] [query,query,...]

(defaults: 10x, /tmp/sfx1, the full QUERIES list; generation is skipped if
dest exists). Scale-posture variants (names ending in ``_hll`` / ``_auto``)
exist only here: they time the documented production path of operators whose
registered query pins a parameter for oracle determinism (exact NDV, fixed
k) — the 100 TB answer is the variant, the oracle answer is the original."""

from __future__ import annotations

import os
import sys
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


def generate(spark, dst: str, k: int) -> None:
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
    shifted("orders", ["o_orderkey", "o_custkey"], nfiles=nf)
    shifted("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"], nfiles=2 * nf)
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
    shifted(
        "documents", ["doc_id"],
        extra=lambda p: p.withColumn(
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
        ),
        nfiles=nf,
    )
    shifted("embeddings", ["vec_id"], nfiles=nf)
    shifted("events", ["event_id", "user_id"], nfiles=nf)


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


# production-posture twins of oracle-pinned queries (see module docstring)
SCALE_VARIANTS = {
    "analyze_table_stats_hll": _stats_hll,
    "semantic_dedup_auto": _semantic_dedup_auto,
}


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfx1"
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else QUERIES
    # the 100x dataset squeezed through one local JVM needs the resources a
    # cluster run would spread across executors: shuffle partitions sized to
    # the data (so per-task sort/agg state stays bounded — the same rule a
    # real deployment applies) and a heap matching the box. 10x keeps the
    # bench defaults so numbers stay comparable with earlier rounds.
    if k > 10:
        os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
        spark = get_spark("scale-check", shuffle_partitions=4 * DEFAULT_CPUS)
    else:
        spark = get_spark("scale-check")
    if not os.path.isdir(dst):
        print(f"# generating {k}x dataset at {dst}", flush=True)
        generate(spark, dst, k)
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    qs = entrymod.queries()
    qs.update(SCALE_VARIANTS)
    total = 0.0
    for name in names:
        qs[name](spark, dst).count()  # warm: plan + codegen compiled
        t = time.time()
        n = qs[name](spark, dst).count()
        dt = time.time() - t
        total += dt
        print(f"{name}: {dt:.2f}s ({n} rows)", flush=True)
    print(f"total: {total:.2f}s over {len(names)} queries at {k}x sf0.1")


if __name__ == "__main__":
    main()
