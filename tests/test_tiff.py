"""Baseline TIFF codec (operators/tiff.py): both byte orders, strip
layouts, grayscale expansion, scope gating, robustness."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from ideafast_etl_spark.operators.multimodal import _decode_any_image
from ideafast_etl_spark.operators.tiff import decode_tiff, encode_tiff


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("rows_per_strip", [None, 1, 2])
def test_roundtrip(big_endian, rows_per_strip):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (5, 4, 3), np.uint8)
    b = encode_tiff(img, big_endian=big_endian, rows_per_strip=rows_per_strip)
    out = decode_tiff(b)
    assert out is not None
    w, h, px = out
    assert (w, h) == (4, 5) and np.array_equal(px, img)


def test_grayscale_expands_to_three_channels():
    """Hand-build a tiny grayscale (photometric 1, spp 1) TIFF."""
    # reuse the encoder then rewrite tags: simpler to build directly
    w, h = 3, 2
    data = bytes(range(10, 10 + w * h))
    e = "<"
    entries = [
        (256, 4, 1, struct.pack(e + "I", w)),
        (257, 4, 1, struct.pack(e + "I", h)),
        (258, 3, 1, struct.pack(e + "HH", 8, 0)),
        (259, 3, 1, struct.pack(e + "HH", 1, 0)),
        (262, 3, 1, struct.pack(e + "HH", 1, 0)),
        (273, 4, 1, None),  # patched
        (277, 3, 1, struct.pack(e + "HH", 1, 0)),
        (279, 4, 1, struct.pack(e + "I", len(data))),
    ]
    ifd_size = 2 + 12 * len(entries) + 4
    strip_off = 8 + ifd_size
    body = struct.pack(e + "H", len(entries))
    for tag, typ, cnt, val in entries:
        if val is None:
            val = struct.pack(e + "I", strip_off)
        body += struct.pack(e + "HHI", tag, typ, cnt) + val
    body += struct.pack(e + "I", 0)
    b = b"II*\x00" + struct.pack(e + "I", 8) + body + data
    out = decode_tiff(b)
    assert out is not None
    w2, h2, px = out
    assert (w2, h2) == (w, h)
    assert np.array_equal(px[..., 0], px[..., 1])
    assert px[0, 0, 0] == 10


def test_compressed_tiff_returns_none():
    img = np.zeros((2, 2, 3), np.uint8)
    b = bytearray(encode_tiff(img))
    # tag 259 (compression) value 1 -> 5 (LZW): entries are sorted, find it
    idx = bytes(b).find(struct.pack("<HH", 259, 3))
    b[idx + 8] = 5
    assert decode_tiff(bytes(b)) is None


def test_decode_chain_routes_tiff():
    img = np.full((3, 3, 3), 77, np.uint8)
    out = _decode_any_image(encode_tiff(img, big_endian=True))
    assert out is not None and np.array_equal(out[2], img)


def test_malformed_never_raises():
    good = encode_tiff(np.zeros((3, 3, 3), np.uint8))
    assert decode_tiff(b"") is None
    assert decode_tiff(good[:10]) is None
    assert decode_tiff(b"II*\x00" + b"\xff" * 20) is None


@given(seed=st.integers(0, 2**32 - 1))
@settings(max_examples=10, deadline=None)
def test_fuzz_mutations(seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (4, 6, 3), np.uint8)
    s = bytearray(encode_tiff(img, rows_per_strip=2))
    for _ in range(8):
        s[int(rng.integers(0, len(s)))] = int(rng.integers(0, 256))
    r = decode_tiff(bytes(s))  # must not raise
    assert r is None or len(r) == 3
