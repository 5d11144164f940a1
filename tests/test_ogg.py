"""Ogg page walker (operators/ogg.py): codec ID headers, granule-derived
duration (Opus pre-skip), lacing, truncation, fuzz robustness."""

import struct

from hypothesis import given, settings, strategies as st

from ideafast_etl_spark.operators.ogg import (
    _page,
    encode_ogg_stub,
    ogg_stream_info,
)


def test_opus_duration_subtracts_preskip():
    info = ogg_stream_info(
        encode_ogg_stub(codec="opus", duration_s=2.0, pre_skip=312)
    )
    assert info["codec"] == "opus" and info["sample_rate"] == 48000
    assert info["duration_s"] == 2.0  # pre-skip excluded per RFC 7845


def test_vorbis_rate_from_id_header():
    info = ogg_stream_info(
        encode_ogg_stub(codec="vorbis", duration_s=0.8, rate=11025, channels=2)
    )
    assert (info["codec"], info["sample_rate"], info["channels"]) == (
        "vorbis", 11025, 2,
    )
    assert info["duration_s"] == 0.8


def test_long_payload_lacing():
    """A payload over 255 bytes needs multi-segment lacing — page walk
    must still land on the next page boundary."""
    big = _page(0x02, 0, 7, 0, b"OpusHead\x01\x01" + b"\x00" * 700)
    nxt = _page(0x04, 48000, 7, 1, b"\x00" * 10)
    info = ogg_stream_info(big + nxt)
    assert info is not None and info["n_pages"] == 2
    assert info["codec"] == "opus"


def test_truncation_keeps_whole_pages():
    b = encode_ogg_stub(duration_s=1.0)
    info = ogg_stream_info(b[:-5])
    assert info is not None and info["n_pages"] == 2


def test_non_ogg_none():
    assert ogg_stream_info(b"") is None
    assert ogg_stream_info(b"ID3\x04\x00\x00\x00\x00\x00\x00") is None
    assert ogg_stream_info(struct.pack("<I", 1) * 10) is None


@given(seed=st.integers(0, 2**32 - 1))
@settings(max_examples=10, deadline=None)
def test_never_raises_on_mutations(seed):
    import numpy as np

    rng = np.random.default_rng(seed)
    s = bytearray(encode_ogg_stub(codec="vorbis", duration_s=1.5))
    for _ in range(10):
        s[int(rng.integers(0, len(s)))] = int(rng.integers(0, 256))
    r = ogg_stream_info(bytes(s))  # must not raise
    assert r is None or isinstance(r, dict)
