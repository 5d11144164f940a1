"""Concurrent-writer fencing for the manifest commit protocol (r11
verdict #6). The protocol is single-writer by contract, but nothing used
to DETECT a second writer: two uncoordinated maintenance processes would
resolve the same next commit id, both stage, and the second PUT to the
same manifest key silently replaced the first — last-wins interleaving
with one writer's staged data invisibly dropped. put_manifest now stamps
each PUT with a per-process writer token and turns that race into a loud
ConcurrentWriterError at both windows: before the PUT (the log already
reached the staged id under another token — stale resolve) and after it
(read-back shows another token's manifest at our key — our PUT lost).
Crash-remnant retries are NOT writers: a truncated manifest at the same
id is overwritten silently, and the same token may re-PUT its own id."""

import json
import os

import pytest

from ideafast_etl_spark.state.manifest import (
    ConcurrentWriterError,
    _dir_meta,
    commit_dir,
    latest_manifest,
    manifest_path,
    next_dir_version,
    put_manifest,
    read_manifest,
    resolve_dir,
)


def test_second_writer_same_id_is_fenced(tmp_path):
    meta = str(tmp_path / "_meta")
    put_manifest(meta, 1, {"v": "a"}, writer="writer-a")
    with pytest.raises(ConcurrentWriterError):
        put_manifest(meta, 1, {"v": "b"}, writer="writer-b")
    # the committed manifest is writer A's, untouched
    assert latest_manifest(meta)[1] == {"v": "a"}


def test_writer_behind_advanced_log_is_fenced(tmp_path):
    """Writer B resolved next id = 1, then writer A committed 1 AND 2;
    B's stale commit must not interleave at any id ≤ the log head."""
    meta = str(tmp_path / "_meta")
    put_manifest(meta, 1, {"v": "a1"}, writer="writer-a")
    put_manifest(meta, 2, {"v": "a2"}, writer="writer-a")
    with pytest.raises(ConcurrentWriterError):
        put_manifest(meta, 1, {"v": "b"}, writer="writer-b")
    with pytest.raises(ConcurrentWriterError):
        put_manifest(meta, 2, {"v": "b"}, writer="writer-b")
    # ids past the head are a legitimate fresh commit
    put_manifest(meta, 3, {"v": "b3"}, writer="writer-b")
    assert latest_manifest(meta) == (3, {"v": "b3"})


def test_same_writer_retry_of_own_id_is_allowed(tmp_path):
    """An idempotent retry by the SAME process (same token) re-PUTs its
    own id — that is the normal crashed-commit retry, not a race."""
    meta = str(tmp_path / "_meta")
    put_manifest(meta, 1, {"v": "x"}, writer="writer-a")
    put_manifest(meta, 1, {"v": "x2"}, writer="writer-a")
    assert latest_manifest(meta) == (1, {"v": "x2"})


def test_truncated_remnant_is_not_a_writer(tmp_path):
    """A crash-truncated manifest at the target id fails its checksum —
    overwriting it is the normal retry path, never a fencing error."""
    meta = str(tmp_path / "_meta")
    os.makedirs(meta)
    with open(manifest_path(meta, 1), "w") as f:
        f.write('{"id": 1, "payload": {"v"')
    put_manifest(meta, 1, {"v": "ok"}, writer="writer-a")
    assert latest_manifest(meta) == (1, {"v": "ok"})


def test_lost_put_detected_by_read_back(tmp_path, monkeypatch):
    """The narrow window the preflight cannot see: writer B's PUT lands
    AFTER writer A's preflight but around A's own PUT — last-wins leaves
    B's manifest at A's key and A's commit silently void. A's read-back
    fence must catch it. Simulated by injecting B's overwrite into the
    fsync step of A's PUT."""
    meta = str(tmp_path / "_meta")
    path = manifest_path(meta, 1)
    real_fsync = os.fsync

    def racing_fsync(fd):
        real_fsync(fd)
        body = json.dumps({"v": "b"}, sort_keys=True)
        import hashlib

        doc = json.dumps(
            {
                "id": 1,
                "payload": {"v": "b"},
                "sha256": hashlib.sha256(body.encode()).hexdigest(),
                "writer": "writer-b",
            }
        )
        with open(path, "w") as g:
            g.write(doc)

    monkeypatch.setattr(os, "fsync", racing_fsync)
    with pytest.raises(ConcurrentWriterError):
        put_manifest(meta, 1, {"v": "a"}, writer="writer-a")
    # B's manifest survived; the log is consistent, just not A's commit
    assert read_manifest(path) == (1, {"v": "b"})


def test_two_writers_racing_commit_dir(tmp_path):
    """End-to-end shape of the real race on the versioned-dir primitive:
    both writers resolve the same next version before either stages.
    The first commit wins; the second writer's commit raises instead of
    silently replacing the winner's manifest, and readers only ever see
    the winner's data."""
    base = str(tmp_path / "t")
    ver_a, dir_a = next_dir_version(base)
    ver_b, dir_b = next_dir_version(base)
    assert (ver_a, dir_a) == (ver_b, dir_b)  # the uncoordinated resolve

    os.makedirs(dir_a, exist_ok=True)
    with open(os.path.join(dir_a, "data.txt"), "w") as f:
        f.write("a")
    commit_dir(base, ver_a)  # writer A commits (process token)
    assert resolve_dir(base) == base + f".v{ver_a}"

    # writer B (a different process: different token) tries to commit
    # the same staged version id
    with pytest.raises(ConcurrentWriterError):
        put_manifest(
            _dir_meta(base), ver_b, {"ver": ver_b}, writer="writer-b"
        )
    assert resolve_dir(base) == base + f".v{ver_a}"
    with open(os.path.join(resolve_dir(base), "data.txt")) as f:
        assert f.read() == "a"
