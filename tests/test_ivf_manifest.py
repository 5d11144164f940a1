"""IVF index manifest commits (r10 verdict #5 + r11 advice): every
maintenance op — BUILD/REBUILD included — must be crash-safe under
object-store semantics. The build stages cells AND the quantizer into
fresh generation dirs (``cells-g<N>``, ``centroids-g<N>``) with ONE
manifest PUT as the commit point; an append's increment stages into its
own final dir; a crashed op's partial dirs are invisible to probes and
repaired delete-only; compaction folds increments back to one generation
dir without changing a single probe value; and superseded dirs survive
one maintenance cycle as the reader grace window. Mirrors
tests/test_bm25_compaction.py."""

import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from ideafast_etl_spark.operators.similarity import (
    _IVF_META,
    _ivf_live,
    _ivf_repair,
    append_ivf_index,
    compact_ivf_index,
    ivf_topk_from_index,
    write_ivf_index,
)
from ideafast_etl_spark.state.manifest import manifest_path


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(7)
    base = np.eye(4, 8) * 10.0
    rows = [
        (int(i), [float(x) for x in base[i % 4] + rng.normal(0, 0.8, 8)])
        for i in range(120)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).cache()


def _probe(spark, idx, queries):
    return sorted(
        map(
            tuple,
            ivf_topk_from_index(spark, idx, queries, k=5, n_probe=2).collect(),
        )
    )


def _q(corpus):
    return corpus.filter(F.col("vec_id") % 40 == 3)


def test_append_commit_is_rename_free(spark, corpus, tmp_path, monkeypatch):
    idx = str(tmp_path / "ivf")

    def boom(*a, **k):  # pragma: no cover - the assertion IS the test
        raise AssertionError("rename used in the index commit path")

    monkeypatch.setattr(os, "rename", boom)
    monkeypatch.setattr(os, "replace", boom)
    monkeypatch.setattr(shutil, "move", boom)
    # r11: the BUILD commits through the manifest too — inside the guard
    write_ivf_index(corpus.filter(F.col("vec_id") < 80), idx, n_cells=4)
    append_ivf_index(spark, idx, corpus.filter(F.col("vec_id") >= 80))
    compact_ivf_index(spark, idx)
    assert _ivf_live(idx)[0] == 3


def test_crashed_append_is_invisible_then_repaired(spark, corpus, tmp_path):
    """Crash after the increment's data dir lands but before the manifest
    PUT (plus a truncated-manifest 'pointer crash'): probes keep reading
    the committed dirs only; the next maintenance call repairs."""
    idx = str(tmp_path / "ivf")
    old = corpus.filter(F.col("vec_id") < 80)
    write_ivf_index(old, idx, n_cells=4)
    q = _q(corpus)
    before = _probe(spark, idx, q)

    # fabricate the crashed attempt: data dir complete, manifest truncated
    shutil.copytree(f"{idx}/cells-g1", f"{idx}/cells-i2")
    with open(manifest_path(f"{idx}/{_IVF_META}", 2), "w") as f:
        f.write('{"id": 2, "payload": {"dirs"')

    cid, live, _cent = _ivf_live(idx)
    assert cid == 1  # committed build still authoritative
    assert [os.path.basename(p) for p in live] == ["cells-g1"]
    assert _probe(spark, idx, q) == before  # partial increment invisible

    # the next append repairs the remnant, then commits its own increment
    append_ivf_index(spark, idx, corpus.filter(F.col("vec_id") >= 80))
    cid, live, _cent = _ivf_live(idx)
    assert cid == 2
    assert [os.path.basename(p) for p in live] == ["cells-g1", "cells-i2"]
    # the repaired cells-i2 is the NEW increment (40 rows), not the
    # crashed full copy (80 rows)
    assert spark.read.parquet(f"{idx}/cells-i2").count() == 40


def test_crashed_rebuild_is_invisible(spark, corpus, tmp_path):
    """r11 advice (the medium finding): a rebuild that crashes after
    staging its new cells/centroids but BEFORE its manifest PUT must
    leave the old index — cells, increments, AND quantizer — fully
    authoritative, with no stale-dir mixing. The old flat-overwrite
    rebuild destroyed the live layout pre-commit."""
    idx = str(tmp_path / "ivf")
    write_ivf_index(corpus.filter(F.col("vec_id") < 60), idx, n_cells=4)
    append_ivf_index(
        spark,
        idx,
        corpus.filter((F.col("vec_id") >= 60) & (F.col("vec_id") < 90)),
    )
    q = _q(corpus)
    before = _probe(spark, idx, q)
    cid_before = _ivf_live(idx)[0]

    # fabricate the crashed rebuild: generation dirs staged, no manifest
    shutil.copytree(f"{idx}/cells-g1", f"{idx}/cells-g{cid_before + 1}")
    shutil.copytree(
        f"{idx}/centroids-g1", f"{idx}/centroids-g{cid_before + 1}"
    )

    cid, live, cent = _ivf_live(idx)
    assert cid == cid_before  # staged rebuild invisible
    assert os.path.basename(cent) == "centroids-g1"
    assert _probe(spark, idx, q) == before

    # the retried rebuild commits atomically; probes flip to the new
    # incarnation only (no stale increments mixed in)
    write_ivf_index(corpus.filter(F.col("vec_id") < 40), idx, n_cells=4)
    cid, live, cent = _ivf_live(idx)
    assert cid == cid_before + 1
    assert [os.path.basename(p) for p in live] == [f"cells-g{cid}"]
    assert os.path.basename(cent) == f"centroids-g{cid}"
    assert spark.read.parquet(live[0]).count() == 40


def test_compaction_is_probe_invisible_and_folds_dirs(spark, corpus, tmp_path):
    idx = str(tmp_path / "ivf")
    write_ivf_index(corpus.filter(F.col("vec_id") < 60), idx, n_cells=4)
    for lo in (60, 80, 100):
        append_ivf_index(
            spark,
            idx,
            corpus.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 20)
            ),
        )
    q = _q(corpus)
    before = _probe(spark, idx, q)
    assert len(_ivf_live(idx)[1]) == 4  # base + 3 increments

    info = compact_ivf_index(spark, idx)
    assert info["folded_dirs"] == 4
    cid, live, _cent = _ivf_live(idx)
    assert len(live) == 1 and os.path.basename(live[0]) == f"cells-g{cid}"
    assert _probe(spark, idx, q) == before  # bit-identical pre/post
    # r11 advice: superseded dirs get ONE maintenance cycle of reader
    # grace (a probe that resolved them pre-commit keeps its files) ...
    assert os.path.isdir(f"{idx}/cells-g1")
    # ... and the next maintenance call's repair retires them
    _ivf_repair(idx)
    assert not os.path.isdir(f"{idx}/cells-g1")
    assert not os.path.isdir(f"{idx}/cells-i2")
    # one file per cell partition after the fold
    for d in os.listdir(live[0]):
        if d.startswith("cell="):
            files = [
                f
                for f in os.listdir(os.path.join(live[0], d))
                if not f.startswith(("_", "."))
            ]
            assert len(files) == 1

    again = _probe(spark, idx, q)
    assert again == before


def test_rebuild_supersedes_increments(spark, corpus, tmp_path):
    """A rebuild commits a fresh generation: stale increments drop out of
    the live set at the commit (no duplicated vectors), linger one cycle
    as grace, then are repaired away."""
    idx = str(tmp_path / "ivf")
    write_ivf_index(corpus.filter(F.col("vec_id") < 80), idx, n_cells=4)
    append_ivf_index(spark, idx, corpus.filter(F.col("vec_id") >= 80))
    assert _ivf_live(idx)[0] == 2
    write_ivf_index(corpus.filter(F.col("vec_id") < 40), idx, n_cells=4)
    cid, live, cent = _ivf_live(idx)
    assert cid == 3
    assert [os.path.basename(p) for p in live] == ["cells-g3"]
    assert os.path.basename(cent) == "centroids-g3"
    # the superseded increment is out of the live set immediately ...
    assert spark.read.parquet(live[0]).count() == 40
    # ... kept on disk one cycle (grace), then repaired
    assert os.path.isdir(f"{idx}/cells-i2")
    _ivf_repair(idx)
    assert not os.path.isdir(f"{idx}/cells-i2")
    assert not os.path.isdir(f"{idx}/cells-g1")
    assert not os.path.isdir(f"{idx}/centroids-g1")


def test_append_after_compaction_matches_union_assignment(
    spark, corpus, tmp_path
):
    """The probe ≡ whole-union parity (the r9 contract) survives any
    append/compact interleaving."""
    from ideafast_etl_spark.operators.clustering import kmeans_assign_to
    from ideafast_etl_spark.operators.similarity import (
        _ivf_probes,
        _ivf_rerank,
    )

    idx = str(tmp_path / "ivf")
    write_ivf_index(corpus.filter(F.col("vec_id") < 60), idx, n_cells=4)
    append_ivf_index(
        spark,
        idx,
        corpus.filter((F.col("vec_id") >= 60) & (F.col("vec_id") < 90)),
    )
    compact_ivf_index(spark, idx)
    append_ivf_index(spark, idx, corpus.filter(F.col("vec_id") >= 90))

    q = _q(corpus)
    got = _probe(spark, idx, q)

    cent = spark.read.parquet(_ivf_live(idx)[2])
    assign = kmeans_assign_to(
        corpus, cent.select(F.col("cell").alias("cid"), "pos", "icval")
    )
    assigned = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("vec"),
    ).join(
        assign.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("cluster_id").cast("int").alias("cell"),
        ),
        "neighbor_id",
    )
    probes = _ivf_probes(q, cent, 2, "vec_id", "embedding")
    want = sorted(
        map(
            tuple,
            _ivf_rerank(probes, assigned, q, 5, "vec_id", "embedding").collect(),
        )
    )
    assert got == want
