"""r11-advice hardening of the shared versioned-dir commit primitive
(state/manifest.py): legacy-sibling version numbering, the one-commit
reader grace window, and legacy-layout remnant cleanup.

Scenarios (ADVICE r11):
- a pre-manifest release numbered snapshot dirs by sibling scan with a
  live ``base`` symlink; the first manifest-era publish must NOT stage
  into the legacy live dir (next_dir_version counts siblings);
- commit_dir keeps the immediately-previous live dir through one commit
  so a reader that resolved it just before the publish can finish its
  scan (StateStore._gc's discipline);
- `<base>.v<N>.legacy` dirs and `<base>.lnk.*` temp symlinks from a
  crashed pre-manifest publish are removed by the commit's cleanup.
"""

import os

from ideafast_etl_spark.state.manifest import (
    commit_dir,
    next_dir_version,
    resolve_dir,
)


def _mkdata(d: str, tag: str) -> None:
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "data.txt"), "w") as f:
        f.write(tag)


def _tag(d: str) -> str:
    with open(os.path.join(d, "data.txt")) as f:
        return f.read()


def test_next_version_skips_legacy_sibling_dirs(tmp_path):
    """A legacy store (sibling-numbered dirs + live symlink, empty
    manifest log) must not have its live snapshot staged over."""
    base = str(tmp_path / "t")
    _mkdata(base + ".v1", "legacy-live")
    os.symlink(base + ".v1", base)
    ver, new_dir = next_dir_version(base)
    assert (ver, new_dir) == (2, base + ".v2")
    # staging + committing never touched the legacy live data
    _mkdata(new_dir, "new")
    assert _tag(base + ".v1") == "legacy-live"
    live = commit_dir(base, ver)
    assert resolve_dir(base) == live == base + ".v2"
    # grace window: the legacy live target survives the FIRST commit so a
    # reader mid-scan through the symlink keeps its files
    assert os.path.isdir(base + ".v1")
    assert _tag(os.path.realpath(base)) == "legacy-live"
    # the SECOND commit retires symlink + legacy target together
    ver2, dir2 = next_dir_version(base)
    assert ver2 == 3
    _mkdata(dir2, "newer")
    commit_dir(base, ver2)
    assert not os.path.lexists(base)  # symlink gone
    assert not os.path.isdir(base + ".v1")  # legacy data gone
    assert os.path.isdir(base + ".v2")  # prev commit in grace
    assert resolve_dir(base) == base + ".v3"


def test_grace_window_keeps_exactly_one_previous_commit(tmp_path):
    base = str(tmp_path / "g")
    for v in (1, 2, 3):
        ver, d = next_dir_version(base)
        assert ver == v
        _mkdata(d, f"v{v}")
        commit_dir(base, ver)
        assert resolve_dir(base) == base + f".v{v}"
        if v > 1:
            assert os.path.isdir(base + f".v{v - 1}")  # grace holder
        if v > 2:
            assert not os.path.isdir(base + f".v{v - 2}")  # expired


def test_flat_legacy_dir_grace_then_retire(tmp_path):
    base = str(tmp_path / "flat")
    _mkdata(base, "flat-live")
    assert resolve_dir(base) == base
    ver, d = next_dir_version(base)
    _mkdata(d, "v1")
    commit_dir(base, ver)
    # first manifest commit: flat dir unreachable but kept (reader grace)
    assert resolve_dir(base) == base + ".v1"
    assert os.path.isdir(base) and _tag(base) == "flat-live"
    ver2, d2 = next_dir_version(base)
    _mkdata(d2, "v2")
    commit_dir(base, ver2)
    assert not os.path.isdir(base)  # retired on the second commit
    assert os.path.isdir(base + ".v1")  # prev commit now holds the grace


def test_cleanup_removes_legacy_remnants(tmp_path):
    """Crashed pre-manifest publishes left `<base>.v<N>.legacy` dirs and
    `<base>.lnk.*` temp symlinks; the commit's cleanup removes them."""
    base = str(tmp_path / "r")
    _mkdata(base + ".v7.legacy", "old")
    _mkdata(base + ".victim-not-matching", "keep")  # foreign sibling
    os.symlink(base + ".v7.legacy", base + ".lnk.1234")
    ver, d = next_dir_version(base)
    assert ver == 1  # .legacy / .lnk names don't count as versions
    _mkdata(d, "v1")
    commit_dir(base, ver)
    assert not os.path.isdir(base + ".v7.legacy")
    assert not os.path.lexists(base + ".lnk.1234")
    assert os.path.isdir(base + ".victim-not-matching")  # untouched
    assert resolve_dir(base) == base + ".v1"


def test_unreferenced_staging_remnant_gets_no_grace(tmp_path):
    """A crashed attempt's staged dir was never live — cleanup removes it
    at the next commit and the version counter moves past it."""
    base = str(tmp_path / "u")
    _mkdata(base + ".v1", "crashed-staging")  # no manifest ever PUT
    assert resolve_dir(base) == base  # invisible
    ver, d = next_dir_version(base)
    assert ver == 2  # sibling scan: never stage over an existing dir
    _mkdata(d, "v2")
    commit_dir(base, ver)
    assert not os.path.isdir(base + ".v1")
    assert resolve_dir(base) == base + ".v2"
