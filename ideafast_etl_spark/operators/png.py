"""Pure-python/numpy PNG codec (SURVEY.md §2.13 codec gap, image leg 2).

PNG is DEFLATE (stdlib ``zlib``) + per-scanline prediction filters, so a
complete from-spec implementation needs no third-party codec: decoder for
8- and 16-bit grayscale / RGB / palette / gray+alpha / RGBA, all five
filter types (None/Sub/Up/Average/Paeth, RFC 2083 §6), and Adam7
interlacing (seven per-pass filtered sub-images); 16-bit samples
downscale to 8-bit via the high byte. A minimal encoder (filter 0 +
zlib) covers fixtures and the re-encode leg.

Same split as ``jpeg.py``: this is the codec half only; the distributed
plumbing lives in ``multimodal.py`` and is codec-agnostic. Per-row Python
loops for the sequential filters (Sub/Average/Paeth decode is a left-to-
right recurrence) are fine for test-sized assets; a production deployment
swaps in libpng/Pillow without touching Spark code.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# channels per pixel for each supported color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(
    raw: bytes, pos: int, h: int, stride: int, bpp: int
) -> tuple[np.ndarray, int]:
    """Reverse the per-scanline filters from ``raw[pos:]`` → ((h, stride)
    uint8 recon array, next offset)."""
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, np.uint8, stride, pos).astype(np.int32)
        pos += stride
        if ftype == 0:
            recon = line
        elif ftype == 1:  # Sub — cumulative within each byte phase mod bpp
            recon = line.copy()
            for x in range(bpp, stride):
                recon[x] = (recon[x] + recon[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            recon = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            recon = line.copy()
            for x in range(stride):
                left = recon[x - bpp] if x >= bpp else 0
                recon[x] = (recon[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            recon = line.copy()
            for x in range(stride):
                left = int(recon[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                recon[x] = (recon[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = recon.astype(np.uint8)
        prev = recon
    return out, pos


def decode_png(b: bytes) -> tuple[int, int, np.ndarray] | None:
    """Decode an 8-bit non-interlaced PNG into (width, height, HxWx3 uint8
    BGR) — same contract as ``decode_bmp`` / ``decode_jpeg_baseline``.
    Alpha channels are dropped; palette images are expanded through PLTE;
    16-bit samples downscale via the high byte; Adam7 passes are
    recomposed. Returns None outside the envelope (sub-byte depths) or
    for malformed bytes — never raises."""
    try:
        return _decode(b)
    except (struct.error, IndexError, KeyError, ValueError, zlib.error):
        return None


def _decode(b: bytes) -> tuple[int, int, np.ndarray] | None:
    if not b.startswith(_SIGNATURE):
        return None
    pos = len(_SIGNATURE)
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(b):
        (length,) = struct.unpack_from(">I", b, pos)
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        if len(data) < length:
            return None  # truncated
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + CRC
    if ihdr is None or not idat:
        return None
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth not in (8, 16) or comp != 0 or filt != 0 or interlace not in (0, 1):
        return None
    nch = _CHANNELS.get(color)
    if nch is None or w == 0 or h == 0:
        return None
    if depth == 16 and color == 3:
        return None  # 16-bit palette indices are not legal PNG
    raw = zlib.decompress(bytes(idat))
    bps = depth // 8  # bytes per sample
    bpp = nch * bps
    if interlace == 0:
        stride = w * bpp
        if len(raw) != h * (stride + 1):
            return None
        rows, _pos = _unfilter(raw, 0, h, stride, bpp)
        recon_bytes = rows
    else:
        recon_bytes = _decode_adam7(raw, w, h, bpp)
        if recon_bytes is None:
            return None
    if depth == 16:
        recon = (
            np.frombuffer(recon_bytes.tobytes(), dtype=">u2")
            .reshape(h, w, nch)
            >> 8
        ).astype(np.uint8)
    else:
        recon = recon_bytes.reshape(h, w, nch)
    if color == 0:  # grayscale
        g = recon[..., 0]
        rgb = np.stack([g, g, g], axis=-1)
    elif color == 2:  # RGB
        rgb = recon
    elif color == 3:  # palette
        if plte is None:
            return None
        rgb = plte[recon[..., 0]]
    elif color == 4:  # gray + alpha → drop alpha
        g = recon[..., 0]
        rgb = np.stack([g, g, g], axis=-1)
    else:  # RGBA → drop alpha
        rgb = recon[..., :3]
    return w, h, rgb[..., ::-1].copy()  # RGB → BGR


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per RFC 2083 §2.6
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _decode_adam7(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray | None:
    """Recompose the seven independently-filtered interlace passes into a
    full (h, w*bpp) byte image."""
    full = np.zeros((h, w * bpp), np.uint8)
    pos = 0
    for x0, y0, xs, ys in _ADAM7:
        pw = -(-(w - x0) // xs) if w > x0 else 0
        ph = -(-(h - y0) // ys) if h > y0 else 0
        if pw == 0 or ph == 0:
            continue
        rows, pos = _unfilter(raw, pos, ph, pw * bpp, bpp)
        for py in range(ph):
            row_view = full[y0 + py * ys].reshape(w, bpp)
            row_view[x0::xs] = rows[py].reshape(pw, bpp)
    if pos != len(raw):
        return None
    return full


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(px: np.ndarray) -> bytes:
    """Encode uint8 pixels (HxWx3 BGR, or HxW grayscale) as a PNG
    (filter 0 scanlines, single IDAT). Lossless — the differential oracle
    can predict decoded pixels exactly."""
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        color = 0
        body = px
    else:
        color = 2
        body = px[..., ::-1]  # BGR → RGB
    stride_data = body.reshape(h, -1)
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter type None
        raw += stride_data[y].tobytes()
    out = bytearray(_SIGNATURE)
    out += _chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    )
    out += _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
    out += _chunk(b"IEND", b"")
    return bytes(out)
