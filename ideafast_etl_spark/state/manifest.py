"""Object-store-safe commit-by-manifest: an append-only log of small,
immutable, self-checksummed JSON files.

The repo's persisted artifacts (streaming accumulations, the BM25 and
IVF index directories) need a commit primitive that works where the
100 TB posture actually runs — object storage, where directory rename
is neither atomic nor guaranteed to exist. The primitive here uses
only create-file / delete operations (single-key PUT semantics):

- a writer stages bulk data into its FINAL directory first (invisible
  until referenced; a crashed attempt is simply overwritten by the
  retry);
- the COMMIT POINT is the creation of one manifest file
  ``<meta>/<id>.json`` holding an integer commit id, an arbitrary
  payload, and a sha256 self-checksum. Manifests are never modified in
  place;
- readers resolve state by picking the highest-id manifest that parses
  and checksums. A manifest truncated by a crash (or observed mid-PUT)
  fails the checksum and is ignored, so the previous commit stays
  authoritative;
- cleanup of superseded data/manifests happens strictly AFTER the new
  manifest lands and is delete-only, hence crash-repairable.

Same shape as Delta's ``_last_checkpoint`` / Iceberg's metadata files.
Every persisted artifact in the repo commits through this module now:
the state store snapshots, the BM25/IVF index generations, streaming
accumulations, optimized table layouts, and monitoring report snapshots.
"""

from __future__ import annotations

import hashlib
import json
import os


def _canonical(payload: dict) -> str:
    return json.dumps(payload, sort_keys=True)


def manifest_path(meta_dir: str, commit_id: int) -> str:
    # zero-padded so lexical order equals numeric order in object listings
    return os.path.join(meta_dir, f"{commit_id:020d}.json")


def put_manifest(meta_dir: str, commit_id: int, payload: dict) -> str:
    """THE commit point: one immutable, self-checksummed file created
    with PUT semantics (no rename). A crash mid-write leaves a file
    that fails the checksum and is ignored by readers."""
    body = _canonical(payload)
    doc = json.dumps(
        {
            "id": commit_id,
            "payload": payload,
            "sha256": hashlib.sha256(body.encode()).hexdigest(),
        }
    )
    os.makedirs(meta_dir, exist_ok=True)
    path = manifest_path(meta_dir, commit_id)
    with open(path, "w") as f:
        f.write(doc)
        f.flush()
        os.fsync(f.fileno())
    return path


def read_manifest(path: str) -> tuple[int, dict] | None:
    """(commit id, payload) if the file parses and self-checksums;
    None for truncated / corrupt / foreign files."""
    try:
        with open(path) as f:
            doc = json.load(f)
        payload = doc["payload"]
        if (
            hashlib.sha256(_canonical(payload).encode()).hexdigest()
            != doc["sha256"]
        ):
            return None
        return int(doc["id"]), payload
    except (OSError, ValueError, KeyError, TypeError):
        return None


def latest_manifest(
    meta_dir: str, valid=None
) -> tuple[int, dict] | None:
    """The highest-id manifest that parses, checksums, and (optionally)
    satisfies ``valid(payload)`` — e.g. "its data directory exists"."""
    if not os.path.isdir(meta_dir):
        return None
    best = None
    for e in os.scandir(meta_dir):
        got = read_manifest(e.path) if e.is_file() else None
        if got is None or (valid is not None and not valid(got[1])):
            continue
        if best is None or got[0] > best[0]:
            best = got
    return best


def prune_manifests(meta_dir: str, keep_id: int | None) -> None:
    """Delete every manifest file except the committed one — truncated
    PUT attempts and superseded entries. Delete-only; safe under the
    single-writer contract."""
    if not os.path.isdir(meta_dir):
        return
    keep = (
        os.path.basename(manifest_path(meta_dir, keep_id))
        if keep_id is not None
        else None
    )
    for e in os.scandir(meta_dir):
        if e.name != keep:
            try:
                os.unlink(e.path)
            except OSError:
                pass


# -- shared versioned-directory commit ---------------------------------------
#
# The one commit primitive for artifacts whose consumer addresses a single
# logical path (an optimized table, a monitoring report snapshot): data for
# commit N lives in the sibling dir `<base>.v<N>`, the manifest log lives in
# `<base>._meta/`, and readers resolve through `resolve_dir(base)` — the flat
# `base` dir itself when no manifest exists (legacy layout). Rename-free end
# to end: stage into the final versioned dir, PUT one manifest, delete
# superseded dirs afterwards (crash-repaired by the next committer).


def _dir_meta(base: str) -> str:
    return base.rstrip("/") + "._meta"


def _ver_dir(base: str, ver: int) -> str:
    return f"{base.rstrip('/')}.v{ver}"


def resolve_dir(base: str) -> str:
    """The live data dir: the newest manifest-committed `<base>.v<N>`
    whose dir exists, else the flat ``base`` itself (legacy / never
    committed). Read-only — never repairs."""
    got = latest_manifest(
        _dir_meta(base),
        valid=lambda p: isinstance(p.get("ver"), int)
        and os.path.isdir(_ver_dir(base, p["ver"])),
    )
    return _ver_dir(base, got[1]["ver"]) if got else base.rstrip("/")


def next_dir_version(base: str) -> tuple[int, str]:
    """(next commit id, the final dir to stage it into). A crashed
    attempt at the same id is simply overwritten by the retry (the dir is
    unreferenced until its manifest lands)."""
    got = latest_manifest(
        _dir_meta(base),
        valid=lambda p: isinstance(p.get("ver"), int)
        and os.path.isdir(_ver_dir(base, p["ver"])),
    )
    nid = (got[0] if got else 0) + 1
    return nid, _ver_dir(base, nid)


def commit_dir(base: str, ver: int) -> str:
    """THE commit point for a staged `<base>.v<ver>` dir: one manifest
    PUT, then delete-only cleanup of superseded version dirs and stale
    manifests. Single-writer contract. Returns the committed dir."""
    import re
    import shutil

    base = base.rstrip("/")
    put_manifest(_dir_meta(base), ver, {"ver": ver})
    name = os.path.basename(base)
    parent = os.path.dirname(os.path.abspath(base)) or "."
    pat = re.compile(rf"^{re.escape(name)}\.v(\d+)$")
    for entry in os.listdir(parent):
        m = pat.match(entry)
        if m and int(m.group(1)) != ver:
            shutil.rmtree(os.path.join(parent, entry), ignore_errors=True)
    prune_manifests(_dir_meta(base), ver)
    return _ver_dir(base, ver)
