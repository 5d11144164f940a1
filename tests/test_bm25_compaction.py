"""BM25 index delta compaction (r9 verdict #2): the additive index's
dfreq/stats delta rows and per-append small files must fold back to the
canonical minimal form without changing a single probe value, appends
must keep working (and keep matching a full rebuild) after any number of
compactions, and the commit must follow the object-store-safe manifest
discipline (state/manifest.py) — rename-free, crash-repairable."""

import os
import shutil

import pytest

from ideafast_etl_spark.operators.retrieval import (
    _BM25_META,
    _bm25_live,
    append_bm25_index,
    bm25_scores,
    bm25_scores_from_index,
    compact_bm25_index,
    write_bm25_index,
)
from ideafast_etl_spark.state.manifest import manifest_path

TERMS = ["spark", "shuffle", "data"]


def _docs(spark, lo, hi):
    words = ["spark", "shuffle", "data", "join", "scan", "agg"]
    rows = [
        (i, " ".join(words[(i + j) % len(words)] for j in range(1 + i % 7)))
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _probe(spark, idx, terms=TERMS):
    return sorted(
        map(tuple, bm25_scores_from_index(spark, idx, terms).collect())
    )


def _nfiles(d):
    return sum(
        1
        for root, _dirs, files in os.walk(d)
        for f in files
        if not f.startswith(("_", "."))
    )


def test_compaction_is_probe_invisible_and_folds_deltas(spark, tmp_path):
    idx = str(tmp_path / "idx")
    write_bm25_index(_docs(spark, 0, 40), idx)
    for lo in (40, 60, 80, 100):
        append_bm25_index(_docs(spark, lo, lo + 20), idx)

    before = _probe(spark, idx)
    info = compact_bm25_index(spark, idx)
    assert _probe(spark, idx) == before  # bit-identical pre/post

    # deltas actually folded: one dfreq row per (term, bucket), one stats
    # row — re-reading through the live resolver
    _, dirs = _bm25_live(idx)
    dfreq = spark.read.parquet(dirs["dfreq"])
    assert dfreq.count() == dfreq.select("t").distinct().count()
    assert spark.read.parquet(dirs["stats"]).count() == 1
    assert info["generation"] == 1
    assert info["folded_stats_rows"] == 5  # 1 build + 4 appends

    # equivalence to a cold full rebuild survives the compaction
    full = str(tmp_path / "full")
    write_bm25_index(_docs(spark, 0, 120), full)
    assert _probe(spark, idx) == _probe(spark, full)


def test_append_after_compaction_matches_rebuild_and_bounds_files(
    spark, tmp_path
):
    """Simulated drain loop: append → compact cycles must keep the file
    count bounded (post-compaction counts do not grow with drain count)
    while every probe stays equal to a full rebuild."""
    idx = str(tmp_path / "idx")
    write_bm25_index(_docs(spark, 0, 30), idx)
    counts = []
    hi = 30
    for _cycle in range(3):
        for _ in range(4):
            append_bm25_index(_docs(spark, hi, hi + 10), idx)
            hi += 10
        compact_bm25_index(spark, idx)
        _, dirs = _bm25_live(idx)
        counts.append(
            _nfiles(dirs["dfreq"]) + _nfiles(dirs["stats"])
        )
    # bounded: the folded metadata footprint is flat across cycles
    assert counts[2] <= counts[0]
    full = str(tmp_path / "full")
    write_bm25_index(_docs(spark, 0, hi), full)
    assert _probe(spark, idx) == _probe(spark, full)
    # appends after the LAST compaction still probe correctly
    append_bm25_index(_docs(spark, hi, hi + 10), idx)
    write_bm25_index(_docs(spark, 0, hi + 10), full)
    assert _probe(spark, idx) == _probe(spark, full)


def test_compaction_commit_is_rename_free(spark, tmp_path, monkeypatch):
    idx = str(tmp_path / "idx")
    write_bm25_index(_docs(spark, 0, 30), idx)
    append_bm25_index(_docs(spark, 30, 50), idx)
    before = _probe(spark, idx)

    def boom(*a, **k):  # pragma: no cover - the assertion IS the test
        raise AssertionError("rename used in the index commit path")

    monkeypatch.setattr(os, "rename", boom)
    monkeypatch.setattr(os, "replace", boom)
    monkeypatch.setattr(shutil, "move", boom)
    compact_bm25_index(spark, idx)
    compact_bm25_index(spark, idx)  # second fold rewrites generation 1
    assert _probe(spark, idx) == before


def test_crashed_compaction_is_invisible_then_repaired(spark, tmp_path):
    """Crash after the new generation's data dirs land but before the
    manifest PUT (plus a truncated-manifest 'pointer crash'): the probe
    keeps reading the old generation; the next compaction repairs."""
    idx = str(tmp_path / "idx")
    write_bm25_index(_docs(spark, 0, 30), idx)
    append_bm25_index(_docs(spark, 30, 50), idx)
    before = _probe(spark, idx)

    # fabricate the crashed attempt: copy current relations to gen-1
    # names (data complete), manifest truncated mid-PUT
    for rel in ("postings", "dfreq", "doclens", "stats"):
        shutil.copytree(f"{idx}/{rel}", f"{idx}/{rel}-g1")
    os.makedirs(f"{idx}/{_BM25_META}", exist_ok=True)
    with open(manifest_path(f"{idx}/{_BM25_META}", 1), "w") as f:
        f.write('{"id": 1, "payload": {"dirs"')

    gen, dirs = _bm25_live(idx)
    assert gen == 0  # flat layout still authoritative
    assert os.path.basename(dirs["dfreq"]) == "dfreq"
    assert _probe(spark, idx) == before

    info = compact_bm25_index(spark, idx)
    assert info["generation"] == 1
    assert _probe(spark, idx) == before
    assert not os.path.isdir(f"{idx}/dfreq")  # superseded flat gen removed


def test_overwrite_resets_generations(spark, tmp_path):
    idx = str(tmp_path / "idx")
    write_bm25_index(_docs(spark, 0, 30), idx)
    compact_bm25_index(spark, idx)
    assert _bm25_live(idx)[0] == 1
    write_bm25_index(_docs(spark, 0, 10), idx)
    assert _bm25_live(idx)[0] == 0  # fresh flat index, no stale manifest
    full = str(tmp_path / "full")
    write_bm25_index(_docs(spark, 0, 10), full)
    assert _probe(spark, idx) == _probe(spark, full)
