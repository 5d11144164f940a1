"""WARC reader (operators/warc.py): record framing, gzip members,
header extraction, truncation, fuzz robustness."""

import hashlib
import zlib

from hypothesis import given, settings, strategies as st

from ideafast_etl_spark.operators.warc import (
    _split_gzip_members,
    encode_warc,
    parse_warc,
    warc_manifest,
)

RECS = [
    ("warcinfo", "", "application/warc-fields", b"software: test\r\n"),
    ("response", "http://e.x/1", "text/plain", b"payload one"),
    ("response", "http://e.x/2", "text/html", b"<html>two</html>"),
]


def test_plain_and_gzip_members_roundtrip():
    for gz in (False, True):
        out = parse_warc(encode_warc(RECS, gzip_members=gz))
        assert [r["headers"]["warc-type"] for r in out] == [
            "warcinfo", "response", "response",
        ]
        assert out[1]["payload"] == b"payload one"
        assert out[2]["headers"]["warc-target-uri"] == "http://e.x/2"
        assert out[0]["version"] == "1.0"


def test_gzip_member_split():
    b = encode_warc(RECS, gzip_members=True)
    members = _split_gzip_members(b)
    assert len(members) == 3
    assert all(m.startswith(b"WARC/1.0") for m in members)


def test_deterministic_gzip_output():
    assert encode_warc(RECS, gzip_members=True) == encode_warc(
        RECS, gzip_members=True
    )


def test_truncated_record_dropped():
    b = encode_warc(RECS)
    assert len(parse_warc(b[:-30])) == 2  # last record's payload cut


def test_binary_payload_with_crlf_inside():
    """Content-Length framing, not delimiter scanning: a payload holding
    CRLFCRLF must not split the record."""
    tricky = b"A\r\n\r\nB" * 3
    out = parse_warc(encode_warc([("resource", "u", "b/x", tricky)]))
    assert out[0]["payload"] == tricky


def test_non_warc_none():
    assert parse_warc(b"") is None
    assert parse_warc(b"HTTP/1.1 200 OK\r\n\r\n") is None
    assert parse_warc(zlib.compress(b"not warc")) is None


def test_manifest_fields(spark):
    rows = [
        (1, bytearray(encode_warc(RECS))),
        (2, bytearray(b"junk")),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "content"])
    got = {(r.doc_id, r.rec_idx): r for r in warc_manifest(df).collect()}
    assert set(got) == {(1, 0), (1, 1), (1, 2)}
    r = got[(1, 1)]
    assert r.warc_type == "response" and r.target_uri == "http://e.x/1"
    assert r.content_length == len(b"payload one")
    assert r.payload_sha256 == hashlib.sha256(b"payload one").hexdigest()


@given(seed=st.integers(0, 2**32 - 1))
@settings(max_examples=10, deadline=None)
def test_fuzz_never_raises(seed):
    import numpy as np

    rng = np.random.default_rng(seed)
    s = bytearray(encode_warc(RECS, gzip_members=bool(seed % 2)))
    for _ in range(10):
        s[int(rng.integers(0, len(s)))] = int(rng.integers(0, 256))
    r = parse_warc(bytes(s))  # must not raise
    assert r is None or isinstance(r, list)
