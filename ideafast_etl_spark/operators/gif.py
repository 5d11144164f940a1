"""Pure-python GIF decoder/encoder (SURVEY.md §2.13 codec gap, image leg 3).

GIF87a/89a static decode from the public specification: logical screen
descriptor, global/local color tables, extension-block skipping, full LZW
decompression (variable code width, clear/EOI codes, sub-block framing,
LSB-first bit packing — note the opposite bit order from JPEG/PNG), and
Adam-style 4-pass row de-interlacing. Animated GIFs decode their FIRST
frame composited onto the logical screen. The encoder emits the classic
"uncompressed" LZW variant (literal codes with periodic clear codes so the
code width never grows) — spec-compliant output any GIF reader accepts.

Same split as ``jpeg.py`` / ``png.py``: codec half only; the distributed
plumbing lives in ``multimodal.py`` and is codec-agnostic.
"""

from __future__ import annotations

import struct

import numpy as np


class _LsbBitReader:
    """LSB-first bit reader (GIF packs codes little-endian within bytes)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bitpos = 0

    def read(self, n: int) -> int:
        v = 0
        got = 0
        while got < n:
            if self.pos >= len(self.data):
                raise EOFError("LZW stream exhausted")
            take = min(8 - self.bitpos, n - got)
            chunk = (self.data[self.pos] >> self.bitpos) & ((1 << take) - 1)
            v |= chunk << got
            got += take
            self.bitpos += take
            if self.bitpos == 8:
                self.bitpos = 0
                self.pos += 1
        return v


def _lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> bytes:
    """GIF-flavor LZW: variable width starting at min_code_size+1, CLEAR
    resets the table, EOI terminates; table grows to 4095 then freezes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    reader = _LsbBitReader(data)
    out = bytearray()

    def _reset():
        return (
            {i: bytes([i]) for i in range(clear)},
            min_code_size + 1,
            eoi + 1,
        )

    table, width, next_code = _reset()
    prev: bytes | None = None
    while len(out) < n_expected:
        code = reader.read(width)
        if code == clear:
            table, width, next_code = _reset()
            prev = None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("invalid LZW code")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    out = np.empty_like(idx)
    rows = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    for src, dst in enumerate(rows):
        out[dst] = idx[src]
    return out


def decode_gif(b: bytes) -> tuple[int, int, np.ndarray] | None:
    """Decode a GIF's first frame into (width, height, HxWx3 uint8 BGR) —
    the shared image-decoder contract. Frame is composited at its offset
    onto the logical screen (background = palette entry 0). Returns None
    for malformed bytes — never raises."""
    try:
        return _decode(b)
    except (struct.error, IndexError, KeyError, ValueError, EOFError,
            OverflowError):
        return None


def _decode(b: bytes) -> tuple[int, int, np.ndarray] | None:
    if len(b) < 13 or b[:3] != b"GIF" or b[3:6] not in (b"87a", b"89a"):
        return None
    w_scr, h_scr, flags, bg_idx, _ar = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return None  # no image data seen
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 1
            while b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
            continue
        if block != 0x2C:  # not an image descriptor
            return None
        x0, y0, w_img, h_img, iflags = struct.unpack_from("<HHHHB", b, pos)
        pos += 9
        pal = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(b, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if pal is None or w_img == 0 or h_img == 0:
            return None
        min_code_size = b[pos]
        pos += 1
        if not (2 <= min_code_size <= 11):
            return None
        data = bytearray()
        while b[pos] != 0:  # concatenate data sub-blocks
            ln = b[pos]
            data += b[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        idx_flat = _lzw_decode(min_code_size, bytes(data), w_img * h_img)
        if len(idx_flat) < w_img * h_img:
            return None
        idx = np.frombuffer(idx_flat, np.uint8, w_img * h_img).reshape(
            h_img, w_img
        )
        if iflags & 0x40:
            idx = _deinterlace(idx)
        idx = np.minimum(idx, len(pal) - 1)
        frame_rgb = pal[idx]
        # composite onto the logical screen at the frame offset
        if (w_img, h_img) == (w_scr, h_scr) and (x0, y0) == (0, 0):
            rgb = frame_rgb
        else:
            bg = pal[min(bg_idx, len(pal) - 1)]
            rgb = np.tile(bg, (h_scr, w_scr, 1)).astype(np.uint8)
            y1 = min(y0 + h_img, h_scr)
            x1 = min(x0 + w_img, w_scr)
            rgb[y0:y1, x0:x1] = frame_rgb[: y1 - y0, : x1 - x0]
        return w_scr, h_scr, rgb[..., ::-1].copy()  # RGB → BGR
    return None


def encode_gif(px: np.ndarray) -> bytes:
    """Encode uint8 pixels (HxWx3 BGR, or HxW palette-index grayscale) as
    a single-frame GIF89a. Colors are quantised to the image's unique
    colors (must be ≤ 256 — this is a fixture/re-encode helper, not a
    general quantiser). LZW payload uses literal codes with periodic clear
    codes (the spec-legal "uncompressed" variant)."""
    if px.ndim == 2:
        px = np.stack([px] * 3, axis=-1)
    h, w = px.shape[:2]
    rgb = px[..., ::-1].reshape(-1, 3)
    colors, idx = np.unique(rgb, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif supports at most 256 distinct colors")
    # palette size must be a power of two ≥ 2
    pal_bits = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    pal = np.zeros((1 << pal_bits, 3), np.uint8)
    pal[: len(colors)] = colors
    min_code = max(2, pal_bits)
    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (pal_bits - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out += bytes([min_code])
    # LSB-first bit writer emitting literal codes; CLEAR before the table
    # would force a width growth (every (1<<width) - eoi - 1 literals)
    acc = 0
    nbits = 0
    payload = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            payload.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    budget = (1 << width) - eoi - 1
    for v in idx:
        if budget == 0:
            emit(clear)
            budget = (1 << width) - eoi - 1
        emit(int(v))
        budget -= 1
    emit(eoi)
    if nbits:
        payload.append(acc & 0xFF)
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
