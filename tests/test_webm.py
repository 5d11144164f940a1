"""WebM/Matroska EBML walker (operators/webm.py): VINT/ID parsing,
track extraction, unknown-size handling, malformed-input robustness."""

import struct

from hypothesis import given, settings, strategies as st

from ideafast_etl_spark.operators.webm import (
    _read_id,
    _read_size,
    _vint,
    encode_webm_stub,
    webm_stream_info,
)


def test_roundtrip_metadata():
    b = encode_webm_stub(
        duration_s=3.25, width=1280, height=720,
        video_codec="V_AV1", audio_rate=44100.0, audio_codec="A_VORBIS",
    )
    info = webm_stream_info(b)
    assert info == {
        "doctype": "webm",
        "duration_s": 3.25,
        "n_tracks": 2,
        "video_codec": "V_AV1",
        "width": 1280,
        "height": 720,
        "audio_codec": "A_VORBIS",
        "audio_rate": 44100.0,
    }


def test_vint_roundtrip_boundaries():
    for n in (0, 1, 126, 127, 128, 16382, 16383, 16384, 2**21 - 2, 2**28):
        enc = _vint(n)
        size, pos = _read_size(enc, 0)
        assert size == n and pos == len(enc)


def test_id_lengths():
    assert _read_id(b"\xae", 0) == (b"\xae", 1)          # 1-byte class
    assert _read_id(b"\x42\x82", 0) == (b"\x42\x82", 2)  # 2-byte class
    assert _read_id(b"\x2a\xd7\xb1", 0) == (b"\x2a\xd7\xb1", 3)
    assert _read_id(b"\x1a\x45\xdf\xa3", 0) == (b"\x1a\x45\xdf\xa3", 4)
    assert _read_id(b"\x00", 0) is None


def test_unknown_size_segment_runs_to_end():
    """Streaming muxers write Segment with unknown size (all VINT value
    bits set) — the walker must treat it as running to the buffer end."""
    b = encode_webm_stub()
    seg_at = b.find(b"\x18\x53\x80\x67")
    mutated = bytearray(b)
    # original segment size VINT starts right after the 4-byte ID; replace
    # a 1-byte VINT with 0xFF (unknown) keeps framing valid
    size, after = _read_size(b, seg_at + 4)
    assert after == seg_at + 5  # fixture uses a 1-byte size
    mutated[seg_at + 4] = 0xFF
    info = webm_stream_info(bytes(mutated))
    assert info is not None and info["video_codec"] == "V_VP9"


def test_non_ebml_returns_none():
    assert webm_stream_info(b"") is None
    assert webm_stream_info(b"RIFF\x00\x00\x00\x00AVI ") is None
    assert webm_stream_info(struct.pack(">I", 0xDEADBEEF) * 8) is None


@given(seed=st.integers(0, 2**32 - 1))
@settings(max_examples=10, deadline=None)
def test_never_raises_on_mutations(seed):
    import numpy as np

    rng = np.random.default_rng(seed)
    s = bytearray(encode_webm_stub())
    for _ in range(10):
        s[int(rng.integers(0, len(s)))] = int(rng.integers(0, 256))
    r = webm_stream_info(bytes(s))  # must not raise
    assert r is None or isinstance(r, dict)
