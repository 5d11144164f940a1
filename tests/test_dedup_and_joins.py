"""J1/J2 join semantics and the §2.13 dedup operators on tiny fixtures."""

from pyspark.sql import functions as F

from ideafast_etl_spark.operators import dedup
from ideafast_etl_spark.operators.joins import dedup_against_state, lookup_join


def test_anti_join_removes_seen_hashes(spark):
    incoming = spark.createDataFrame([("a",), ("b",), ("c",)], ["hash"])
    state = spark.createDataFrame([("b",)], ["hash"])
    out = {r["hash"] for r in dedup_against_state(incoming, state).collect()}
    assert out == {"a", "c"}


def test_lookup_join_keeps_unmatched_as_null(spark):
    facts = spark.createDataFrame([("u1",), ("u2",)], ["uid"])
    dim = spark.createDataFrame([("u1", "S-1")], ["dreem_uid", "serial"])
    out = lookup_join(
        facts,
        dim,
        on=F.col("uid") == F.col("dreem_uid"),
        select_from_dim={"dreem_uid": "dreem_uid", "serial": "device_serial"},
    )
    rows = {r["uid"]: r["device_serial"] for r in out.collect()}
    assert rows == {"u1": "S-1", "u2": None}


def test_exact_dedup_keeps_lowest_id_and_counts(spark):
    docs = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "different")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["n_dupes"] for r in dedup.exact_dedup(docs).collect()}
    # normalisation (lowercase + whitespace collapse) makes 1 and 2 identical
    assert out == {1: 2, 3: 1}


def test_word_shingles_and_jaccard(spark):
    df = spark.createDataFrame([("a b c d",)], ["text"])
    sh = dedup.with_shingles(df).first()["shingles"]
    assert sh == ["a b c", "b c d"]
    short = spark.createDataFrame([("a b",)], ["text"])
    assert dedup.with_shingles(short).first()["shingles"] == []


def test_minhash_identical_docs_share_signature(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "completely unrelated text about something else entirely")],
        ["doc_id", "text"],
    )
    sigs = {r["doc_id"]: r["minhash"] for r in dedup.with_minhash(docs).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]


def test_minhash_near_dup_finds_identical_pair(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "the quick brown fox jumps over the lazy dog today"),
         (3, "completely unrelated text about anything else entirely now")],
        ["doc_id", "text"],
    )
    pairs = dedup.minhash_near_dup_pairs(docs, threshold=0.5).collect()
    assert [(p["id_a"], p["id_b"], p["jaccard_sim"]) for p in pairs] == [(1, 2, 1.0)]


def test_simhash_near_dup_pairs_finds_near_identical(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " lambda"),  # tiny perturbation → low hamming
            (3, "totally different words entirely unrelated content here now"),
        ],
        ["doc_id", "text"],
    )
    pairs = dedup.simhash_near_dup_pairs(
        docs, max_hamming=6, n_bands=8, max_df_ratio=0.9
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_simhash_similar_docs_close_hamming(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy cat"),
         (3, "zzz qqq www eee rrr ttt yyy uuu iii")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["sh"] for r in docs.select(
        "doc_id", dedup.simhash(F.col("text")).alias("sh")).collect()}

    def ham(a, b):
        return bin(a ^ b).count("1")

    assert ham(out[1], out[2]) < ham(out[1], out[3])


def test_ngram_hot_shingle_cap_warns_and_trims(spark):
    import pytest

    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),  # exact dup of 1
        (3, "common phrase here three"),
        (4, "common phrase here four"),
        (5, "common phrase here five"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # uncapped: docs 3/4/5 pair up via the shared "common phrase here" shingle
    base = dedup.ngram_jaccard_pairs(df, threshold=0.3, block_col=None)
    assert {(r["id_a"], r["id_b"]) for r in base.collect()} == {
        (1, 2), (3, 4), (3, 5), (4, 5),
    }
    # capped at doc-freq 2: the hot shingle (df=3) is trimmed with a warning;
    # pairs that shared ONLY it disappear, the real dup pair survives
    with pytest.warns(UserWarning, match="hot-shingle cap trimmed"):
        capped = dedup.ngram_jaccard_pairs(
            df, threshold=0.3, block_col=None, hot_doc_freq=2
        )
    assert {(r["id_a"], r["id_b"]) for r in capped.collect()} == {(1, 2)}


def test_star_candidates_preserve_dup_cluster_connectivity(spark):
    """r9 duplicate-density posture: on a planted template cluster (every
    member pairwise-similar) the star pair graph links each member to the
    cluster's min id, so near_dup_clusters(candidates='star') produces
    EXACTLY the same components as the full quadratic enumeration — with
    O(members) candidates instead of C(n, 2)."""
    template = " ".join(f"w{i}" for i in range(40))
    rows = [(i, f"{template} u{i}a u{i}b") for i in range(30)]
    rows += [
        (100 + i, f"entirely different prose number{i} topic{i} item{i} "
                  f"thing{i} extra{i} more{i} words{i} here{i}")
        for i in range(8)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    full = sorted(
        map(tuple, dedup.near_dup_clusters(docs, threshold=0.5).collect())
    )
    star = sorted(
        map(
            tuple,
            dedup.near_dup_clusters(
                docs, threshold=0.5, candidates="star"
            ).collect(),
        )
    )
    assert full == star
    assert [(i, 0) for i in range(30)] == [p for p in full if p[0] < 100]

    # the star pair list is the bounded one: every pair anchors at a
    # bucket-min representative (the unique suffix words split the
    # cluster across a few band keys, so there can be a handful of
    # anchors — one per bucket — but never the quadratic enumeration)
    pairs = dedup.minhash_near_dup_pairs(
        docs, threshold=0.5, candidates="star"
    ).collect()
    hot = [(r.id_a, r.id_b) for r in pairs if r.id_b < 100]
    anchors = {a for a, _ in hot}
    assert hot and len(anchors) <= 8  # few bucket reps, not every doc
    assert len(hot) < 30 * 29 // 2  # bounded, not C(30, 2)

    # simhash star mode: same star shape over its own verify
    sp = dedup.simhash_near_dup_pairs(
        docs, max_hamming=3, candidates="star"
    ).collect()
    assert all(r.id_a < r.id_b for r in sp)
