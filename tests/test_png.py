"""PNG codec (operators/png.py) and its Spark integration.

The handcrafted test builds the chunk stream and the filtered scanlines by
hand (filters Sub/Up/Average/Paeth written out explicitly with precomputed
recurrences), so it validates the DECODER's unfilter logic independently
of our encoder, which only ever emits filter 0."""

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from ideafast_etl_spark.operators import multimodal as mm
from ideafast_etl_spark.operators.png import decode_png, encode_png

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype, data):
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_from_raw(w, h, color, raw):
    return (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_decode_handcrafted_all_filter_types():
    """4x4 grayscale, one scanline per filter type. Expected recon values
    are computed by hand from RFC 2083 §6:

      row0 (None):  filt 10 20 30 40 → recon 10 20 30 40
      row1 (Sub):   filt 5 10 15 20 → recon[x] = filt[x] + recon[x-1]:
        5, 15, 30, 50
      row2 (Up):    filt 1 1 1 1 → recon = row1 + 1: 6 16 31 51
      row3 (Paeth): filt 0 0 0 0 → recon[x] = paeth(left, up, ul);
        x0: paeth(0,6,0)=6; x1: paeth(6,16,6)=16; x2: paeth(16,31,16)=31;
        x3: paeth(31,51,31)=51
    """
    raw = bytes(
        [0, 10, 20, 30, 40]
        + [1, 5, 10, 15, 20]
        + [2, 1, 1, 1, 1]
        + [4, 0, 0, 0, 0]
    )
    decoded = decode_png(_png_from_raw(4, 4, 0, raw))
    assert decoded is not None
    w, h, px = decoded
    assert (w, h) == (4, 4)
    expected = np.array(
        [
            [10, 20, 30, 40],
            [5, 15, 30, 50],
            [6, 16, 31, 51],
            [6, 16, 31, 51],
        ],
        dtype=np.uint8,
    )
    assert np.array_equal(px[..., 0], expected)
    assert np.array_equal(px[..., 1], expected)  # gray replicated to BGR


def test_decode_handcrafted_average_filter():
    """2x2 RGB with an Average row: recon[x] = filt[x] +
    floor((left + up) / 2). Row0 (None): pixels (10,20,30),(50,60,70).
    Row1 (Average, filt all 8): x<3 left=0 → 8+floor(up/2);
    r1p0 = (8+5, 8+10, 8+15) = (13,18,23);
    r1p1: left=recon[x-3], up=row0[x]:
      8+floor((13+50)/2)=8+31=39; 8+floor((18+60)/2)=8+39=47;
      8+floor((23+70)/2)=8+46=54."""
    raw = bytes([0, 10, 20, 30, 50, 60, 70] + [3, 8, 8, 8, 8, 8, 8])
    decoded = decode_png(_png_from_raw(2, 2, 2, raw))
    assert decoded is not None
    w, h, px = decoded
    # decoder returns BGR; handcrafted raw is RGB
    assert tuple(px[0, 0][::-1]) == (10, 20, 30)
    assert tuple(px[0, 1][::-1]) == (50, 60, 70)
    assert tuple(px[1, 0][::-1]) == (13, 18, 23)
    assert tuple(px[1, 1][::-1]) == (39, 47, 54)


def test_decode_palette_and_alpha_variants():
    # palette: 2 entries, 1x2 image of indices [1, 0]
    plte = bytes([255, 0, 0, 0, 0, 255])  # red, blue (RGB order)
    raw = bytes([0, 1, 0])
    png = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    w, h, px = decode_png(png)
    assert (w, h) == (2, 1)
    assert tuple(px[0, 0]) == (255, 0, 0)  # blue in BGR
    assert tuple(px[0, 1]) == (0, 0, 255)  # red in BGR
    # RGBA: alpha dropped
    raw = bytes([0, 10, 20, 30, 200, 40, 50, 60, 7])
    w, h, px = decode_png(_png_from_raw(2, 1, 6, raw))
    assert (w, h) == (2, 1)
    assert tuple(px[0, 0]) == (30, 20, 10)
    assert tuple(px[0, 1]) == (60, 50, 40)
    # gray+alpha: alpha dropped, gray replicated
    raw = bytes([0, 99, 128, 55, 0])
    w, h, px = decode_png(_png_from_raw(2, 1, 4, raw))
    assert tuple(px[0, 0]) == (99, 99, 99)
    assert tuple(px[0, 1]) == (55, 55, 55)


def test_roundtrip_exact_lossless():
    rng = np.random.default_rng(11)
    for img in (
        np.full((5, 9), 77, np.uint8),
        rng.integers(0, 256, (13, 7), np.uint8),
        rng.integers(0, 256, (20, 31, 3), np.uint8),
        np.zeros((1, 1, 3), np.uint8),
    ):
        w, h, px = decode_png(encode_png(img))
        assert (w, h) == (img.shape[1], img.shape[0])
        ref = np.stack([img] * 3, -1) if img.ndim == 2 else img
        assert np.array_equal(px, ref)


def test_unsupported_and_malformed_return_none():
    assert decode_png(b"nope") is None
    good = encode_png(np.full((8, 8), 1, np.uint8))
    assert decode_png(good[:24]) is None  # truncated before IDAT
    # 16-bit depth declared over 8-bit-sized data → stride mismatch
    bad = bytearray(good)
    i = bad.find(b"IHDR")
    bad[i + 4 + 8] = 16  # bit-depth byte of IHDR data
    assert decode_png(bytes(bad)) is None
    # interlace declared over sequential-sized data → pass-length mismatch
    bad = bytearray(good)
    bad[i + 4 + 12] = 1
    assert decode_png(bytes(bad)) is None
    # corrupt deflate stream
    bad = bytearray(good)
    j = bad.find(b"IDAT")
    bad[j + 8] ^= 0xFF
    assert decode_png(bytes(bad)) is None


def test_16bit_depth_downscales_via_high_byte():
    """16-bit gray and RGB: decoder unfilters at 2-byte bpp and keeps the
    high byte (low byte deliberately nonzero to catch offset errors)."""
    img8 = np.array([[10, 200, 30], [255, 0, 128]], np.uint8)
    raw = bytearray()
    for y in range(2):
        raw.append(0)
        for x in range(3):
            raw += struct.pack(">H", (int(img8[y, x]) << 8) | 0x7F)
    png = _png_from_raw16(3, 2, 0, bytes(raw))
    w, h, px = decode_png(png)
    assert (w, h) == (3, 2)
    assert np.array_equal(px[..., 0], img8)
    rgb = np.array([[[1, 2, 3], [4, 5, 6]]], np.uint8)
    raw = bytearray([0])
    for x in range(2):
        for c in range(3):
            raw += struct.pack(">H", int(rgb[0, x, c]) << 8)
    w, h, px = decode_png(_png_from_raw16(2, 1, 2, bytes(raw)))
    assert np.array_equal(px, rgb[..., ::-1])  # returned BGR


def _png_from_raw16(w, h, color, raw):
    return (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, color, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_adam7_interlaced_recomposes_all_passes():
    """Build the seven per-pass filtered sub-images from a reference image
    and expect the decoder to recompose it exactly (every pass non-empty
    at 10x9)."""
    ref = np.arange(9 * 10, dtype=np.uint8).reshape(9, 10)
    passes = (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    )
    raw = bytearray()
    for x0, y0, xs, ys in passes:
        sub = ref[y0::ys, x0::xs]
        if sub.size == 0:
            continue
        for row in sub:
            raw.append(0)
            raw += row.tobytes()
    png = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 10, 9, 8, 0, 0, 0, 1))
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    decoded = decode_png(png)
    assert decoded is not None
    w, h, px = decoded
    assert (w, h) == (10, 9)
    assert np.array_equal(px[..., 0], ref)


def test_decode_image_features_handles_png(spark):
    rows = []
    for i in range(4):
        bgr = np.array([10 * i, 20 * i, 30 * i], np.uint8)
        px = np.tile(bgr, (3, 5, 1))
        rows.append((i, bytearray(encode_png(px))))
    df = spark.createDataFrame(rows, "asset_id long, content binary")
    got = {
        r["asset_id"]: r
        for r in mm.decode_image_features(df, fake=False).collect()
    }
    for i in range(4):
        r = got[i]
        assert (r["width"], r["height"]) == (5, 3)
        expected = (0.114 * 10 * i + 0.587 * 20 * i + 0.299 * 30 * i) / 255.0
        assert r["mean_luma"] == pytest.approx(expected, abs=1e-9)


def test_sniff_identifies_png(spark):
    b = encode_png(np.full((4, 4), 9, np.uint8))
    df = spark.createDataFrame([(bytearray(b),)], "content binary")
    got = df.select(mm.sniff_media_type("content").alias("t")).first()["t"]
    assert got == "image/png"
