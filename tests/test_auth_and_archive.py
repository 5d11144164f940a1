"""A1/A2 auth plumbing (ported cases from the reference's jwt tests) and
K9/K10 archive lifecycle."""

import base64
import json

import pytest

from ideafast_etl_spark.sinks.archive import rm_local_data, run_scratch, zip_folder
from ideafast_etl_spark.sources.auth import (
    JwtSessionManager,
    extract_dot_path,
)


def _fake_jwt(exp: int) -> str:
    header = base64.urlsafe_b64encode(b'{"alg":"none"}').rstrip(b"=")
    payload = base64.urlsafe_b64encode(json.dumps({"exp": exp}).encode()).rstrip(b"=")
    return f"{header.decode()}.{payload.decode()}.sig"


# --- A2 dot-path (tests/hooks/test_jwt.py:11-88 cases) ----------------------


@pytest.mark.parametrize(
    "path,expected",
    [
        ("token", "t0"),
        ("a.b", "nested"),
        ("a.list.[1]", "second"),
        ("a.list.[0]", "first"),
        ("a.deep.[1].c", "found"),
    ],
)
def test_dot_path_extraction(path, expected):
    payload = {
        "token": "t0",
        "a": {
            "b": "nested",
            "list": ["first", "second"],
            "deep": [{"c": "no"}, {"c": "found"}],
        },
    }
    assert extract_dot_path(payload, path) == expected


@pytest.mark.parametrize("path", ["missing", "a.nope", "a.list.[9]", "token.sub"])
def test_dot_path_keyerror_on_absent(path):
    payload = {"token": "t0", "a": {"list": ["x"]}}
    with pytest.raises(KeyError):
        extract_dot_path(payload, path)


# --- A1 session manager (test_jwt.py:103-156 cases) -------------------------


def test_refresh_only_when_expired():
    clock = {"t": 1000.0}
    calls = []

    def refresh():
        calls.append(1)
        return {"data": {"token": _fake_jwt(int(clock["t"]) + 3600)}}

    mgr = JwtSessionManager(refresh, "data.token", now=lambda: clock["t"])
    t1 = mgr.get_token()
    t2 = mgr.get_token()  # still valid → no second refresh
    assert t1 == t2 and len(calls) == 1
    clock["t"] += 4000  # past expiry
    t3 = mgr.get_token()
    assert len(calls) == 2 and t3 != ""


def test_expiring_within_leeway_refreshes():
    clock = {"t": 1000.0}
    mgr = JwtSessionManager(
        lambda: {"token": _fake_jwt(2000)},
        "token",
        initial_token=_fake_jwt(int(clock["t"]) + 10),  # expires in 10s < 30s leeway
        now=lambda: clock["t"],
    )
    assert mgr.get_token() == _fake_jwt(2000)


def test_refreshed_token_persisted():
    persisted = []
    mgr = JwtSessionManager(
        lambda: {"token": _fake_jwt(99999999999)},
        "token",
        persist=persisted.append,
    )
    tok = mgr.get_token()
    assert persisted == [tok]


def test_refresh_without_token_in_response_raises():
    mgr = JwtSessionManager(lambda: {"nope": 1}, "token")
    with pytest.raises(KeyError):
        mgr.get_token()


def test_auth_header_shape():
    mgr = JwtSessionManager(lambda: {"token": _fake_jwt(99999999999)}, "token")
    h = mgr.auth_header()
    assert h["Authorization"].startswith("Bearer ")


# --- K9/K10 archive lifecycle (test_dmp.py:78-122 cases) --------------------


def test_zip_and_cleanup_idempotent(tmp_path):
    group = tmp_path / "NR1DEVICE-APATIENT-20211213-20211213"
    group.mkdir()
    (group / "rec1.h5").write_bytes(b"payload-1")
    (group / "rec2.h5").write_bytes(b"payload-2")
    z = zip_folder(group)
    assert z.exists() and z.suffix == ".zip"
    import zipfile

    assert sorted(zipfile.ZipFile(z).namelist()) == ["rec1.h5", "rec2.h5"]
    rm_local_data(z)
    assert not z.exists() and not group.exists()
    rm_local_data(z)  # second call is a no-op, not an error


def test_run_scratch_always_cleans(tmp_path):
    kept = None
    with pytest.raises(RuntimeError):
        with run_scratch() as d:
            kept = d
            (d / "x").write_text("y")
            raise RuntimeError("upstream task failed")
    assert kept is not None and not kept.exists()
