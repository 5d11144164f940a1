"""Pure-python/numpy JPEG codec (SURVEY.md §2.13 codec gap).

The container has no Pillow/libjpeg, so compressed-image coverage is
implemented from the public JPEG specification (ITU-T T.81): a decoder for
both baseline-sequential (SOF0) and progressive (SOF2) DCT streams — 8-bit,
grayscale or YCbCr, sampling factors 1-2 per axis (4:4:4 / 4:2:2 / 4:2:0),
restart markers, byte stuffing, and the full progressive machinery
(spectral selection, successive approximation with DC/AC first and
refinement scans, EOB runs per T.81 G.2) — plus a matching minimal encoder
(sequential or progressive) used for test fixtures and the re-encode leg
of image pipelines.

This is the *codec* half only; the distributed plumbing (Arrow batches via
``mapInPandas``, no driver collection) lives in ``multimodal.py`` and is
codec-agnostic. A production deployment swaps these functions for
libjpeg-turbo bindings without touching any Spark code — per-block Python
loops are fine for test-sized assets but are not the 100 TB hot path.

Reference parity note: the reference pipeline (dags/dreem.py) moves opaque
binary payloads without decoding; image decode is part of this repo's
LLM-extension surface, not a reference port.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# zigzag scan order: position k in the scan reads raster index _ZIGZAG[k]
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8-point DCT-II basis: F = A f A^T matches T.81's FDCT scaling
_A = np.zeros((8, 8))
for _u in range(8):
    _cu = math.sqrt(1 / 8) if _u == 0 else math.sqrt(2 / 8)
    for _x in range(8):
        _A[_u, _x] = _cu * math.cos((2 * _x + 1) * _u * math.pi / 16)


def _fdct(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


def _idct(coeffs: np.ndarray) -> np.ndarray:
    return _A.T @ coeffs @ _A


def _build_decode_lut(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman (T.81 Annex C): {(code_length, code): symbol}."""
    lut = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lut[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return lut


def _build_encode_lut(bits: list[int], vals: list[int]) -> dict:
    """{symbol: (code_length, code)} — inverse of the decode table."""
    return {
        sym: (length, code)
        for (length, code), sym in _build_decode_lut(bits, vals).items()
    }


class _BitReader:
    """MSB-first bit reader over an already-destuffed entropy segment."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.byte_pos = 0
        self.bit_pos = 0

    def read_bit(self) -> int:
        if self.byte_pos >= len(self.data):
            raise EOFError("entropy segment exhausted")
        bit = (self.data[self.byte_pos] >> (7 - self.bit_pos)) & 1
        self.bit_pos += 1
        if self.bit_pos == 8:
            self.bit_pos = 0
            self.byte_pos += 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, lut: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s magnitude bits to a signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _split_scan(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Destuff the entropy-coded bytes from ``start``, splitting at RSTn
    markers. Returns (segments, index of the terminating marker's 0xFF)."""
    segments: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:  # stuffed 0xFF literal
            cur.append(0xFF)
            i += 2
        elif nxt == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
            i += 1
        elif 0xD0 <= nxt <= 0xD7:  # restart marker: segment boundary
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # any real marker ends the scan
            break
    segments.append(bytes(cur))
    return segments, i


def decode_jpeg_baseline(b: bytes) -> tuple[int, int, np.ndarray] | None:
    """Decode a baseline-sequential (SOF0) or progressive (SOF2) JPEG into
    (width, height, HxWx3 uint8 BGR) — the same contract as
    ``multimodal.decode_bmp``. Progressive support covers the full T.81
    machinery: spectral selection, successive approximation (DC and AC
    first + refinement scans, EOB runs), interleaved DC scans and
    per-component AC scans. Returns None for anything outside the
    supported envelope (12-bit precision, arithmetic coding, lossless or
    hierarchical frames, >2x subsampling, CMYK) so callers fall through
    to the codec stub — and for malformed/truncated byte streams
    (untrusted binary columns must never raise out of the decode UDF)."""
    try:
        return _decode_jpeg(b)
    except (
        struct.error, IndexError, KeyError, ValueError, EOFError,
        OverflowError,
    ):
        return None


def _decode_jpeg(b: bytes) -> tuple[int, int, np.ndarray] | None:
    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:  # SOI
        return None
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (H, W, [(comp_id, h, v, tq), ...])
    progressive = False
    prog = None  # _ProgressiveState once the first SOF2 scan arrives
    restart_interval = 0
    i = 2
    n = len(b)
    while i < n - 1:
        if b[i] != 0xFF:
            return None  # garbage between markers
        if b[i + 1] == 0xFF:  # fill byte padding before a marker (B.1.1.2)
            i += 1
            continue
        marker = b[i + 1]
        i += 2
        if marker == 0xD8 or (0xD0 <= marker <= 0xD7):
            continue  # no payload
        if marker == 0xD9:  # EOI — progressive output point
            if prog is not None:
                return prog.finish(qt)
            return None
        (seg_len,) = struct.unpack_from(">H", b, i)
        seg = b[i + 2 : i + seg_len]
        if marker == 0xDB:  # DQT — possibly several tables per segment
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, p).astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, p).astype(np.int32)
                    p += 128
                raster = np.zeros(64, np.int32)
                raster[_ZIGZAG] = tbl
                qt[tq] = raster.reshape(8, 8)
        elif marker == 0xC4:  # DHT — possibly several tables per segment
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode_lut(
                    bits, vals
                )
                p += 17 + nv
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            prec = seg[0]
            h_img, w_img = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            if prec != 8 or ncomp not in (1, 3):
                return None
            comps = []
            for c in range(ncomp):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, seg[8 + 3 * c]))
            if any(
                hh not in (1, 2) or vv not in (1, 2) for _, hh, vv, _ in comps
            ):
                return None
            frame = (h_img, w_img, comps)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline/non-progressive frame types
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if frame is None:
                return None
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs = seg[1 + 2 * c]
                tt = seg[2 + 2 * c]
                scan_comps.append((cs, tt >> 4, tt & 0x0F))
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            segments, end = _split_scan(b, i + seg_len)
            if not progressive:
                return _decode_scan(
                    frame,
                    {cs: (td, ta) for cs, td, ta in scan_comps},
                    qt, huff_dc, huff_ac, restart_interval, segments,
                )
            if prog is None:
                prog = _ProgressiveState(frame)
            if not prog.scan(
                scan_comps, ss, se, ah, al,
                huff_dc, huff_ac, restart_interval, segments,
            ):
                return None
            i = end
            continue
        # APPn / COM / DNL and anything else: skip
        i += seg_len
    return None


def _decode_scan(frame, scan_tables, qt, huff_dc, huff_ac,
                 restart_interval, segments):
    h_img, w_img, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))
    planes = {
        cid: np.zeros((mcus_y * vv * 8, mcus_x * hh * 8), np.float64)
        for cid, hh, vv, _tq in comps
    }
    dc_pred = {cid: 0 for cid, *_ in comps}
    seg_idx = 0
    reader = _BitReader(segments[0])
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                seg_idx += 1
                if seg_idx >= len(segments):
                    return None
                reader = _BitReader(segments[seg_idx])
                dc_pred = {cid: 0 for cid in dc_pred}
            for cid, hh, vv, tq in comps:
                dlut = huff_dc.get(scan_tables[cid][0])
                alut = huff_ac.get(scan_tables[cid][1])
                q = qt.get(tq)
                if dlut is None or alut is None or q is None:
                    return None
                for by in range(vv):
                    for bx in range(hh):
                        try:
                            zz = np.zeros(64, np.int32)
                            s = reader.read_symbol(dlut)
                            diff = _extend(reader.read_bits(s), s)
                            dc_pred[cid] += diff
                            # Legal baseline DC values fit in 12 bits
                            # (T.81 table F.1: category <= 11); a
                            # predictor outside +-2^15 means the stream
                            # is corrupt — bail before the int32 store
                            # overflows (untrusted-input contract).
                            if abs(dc_pred[cid]) > 1 << 15:
                                return None
                            zz[0] = dc_pred[cid]
                            k = 1
                            while k < 64:
                                rs = reader.read_symbol(alut)
                                r, size = rs >> 4, rs & 0x0F
                                if size == 0:
                                    if r == 15:  # ZRL: 16 zeros
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    return None
                                zz[k] = _extend(reader.read_bits(size), size)
                                k += 1
                        except (EOFError, ValueError, OverflowError):
                            return None
                        coeffs = np.zeros(64, np.int32)
                        coeffs[_ZIGZAG] = zz
                        block = _idct((coeffs.reshape(8, 8) * q).astype(np.float64))
                        y0, x0 = (my * vv + by) * 8, (mx * hh + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    return _planes_to_image(frame, planes)


def _planes_to_image(frame, planes):
    """Upsample subsampled component planes to full resolution, crop to the
    true image size, level-shift and color-convert → (w, h, BGR)."""
    h_img, w_img, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    full = []
    for cid, hh, vv, _tq in comps:
        p = planes[cid]
        if hh < hmax:
            p = np.repeat(p, hmax // hh, axis=1)
        if vv < vmax:
            p = np.repeat(p, vmax // vv, axis=0)
        full.append(p[:h_img, :w_img] + 128.0)
    if len(full) == 1:
        g = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return w_img, h_img, np.stack([g, g, g], axis=-1)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bch = y + 1.772 * (cb - 128.0)
    bgr = np.stack(
        [
            np.clip(np.rint(bch), 0, 255),
            np.clip(np.rint(g), 0, 255),
            np.clip(np.rint(r), 0, 255),
        ],
        axis=-1,
    ).astype(np.uint8)
    return w_img, h_img, bgr


class _ProgressiveState:
    """Coefficient accumulator for progressive (SOF2) decoding: each SOS
    scan deposits or refines DCT coefficients; ``finish`` dequantizes and
    inverse-transforms once after EOI. Scan algorithms follow T.81 G.2 /
    the public libjpeg structure (decode_mcu_DC_first/refine,
    decode_mcu_AC_first/refine), including EOB runs."""

    def __init__(self, frame) -> None:
        self.frame = frame
        h_img, w_img, comps = frame
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        self.mcus_x = -(-w_img // (8 * self.hmax))
        self.mcus_y = -(-h_img // (8 * self.vmax))
        # per-component coefficient grids, natural (raster-in-block) order;
        # allocated at MCU-padded size, true block dims kept for AC scans
        self.coef: dict[int, np.ndarray] = {}
        self.true_blocks: dict[int, tuple[int, int]] = {}
        self.comp_geom: dict[int, tuple[int, int, int]] = {}
        for cid, hh, vv, tq in comps:
            self.coef[cid] = np.zeros(
                (self.mcus_y * vv, self.mcus_x * hh, 64), np.int64
            )
            # true block dims: ceil(ceil(W*h/hmax)/8) × ceil(ceil(H*v/vmax)/8)
            cw = -(-w_img * hh // self.hmax)
            ch = -(-h_img * vv // self.vmax)
            self.true_blocks[cid] = (-(-ch // 8), -(-cw // 8))
            self.comp_geom[cid] = (hh, vv, tq)
        self.eobrun = 0

    def scan(self, scan_comps, ss, se, ah, al,
             huff_dc, huff_ac, restart_interval, segments) -> bool:
        try:
            if ss == 0:
                if se != 0:
                    return False  # DC scan must have Se=0 in progressive
                return self._dc_scan(
                    scan_comps, ah, al, huff_dc, restart_interval, segments
                )
            if len(scan_comps) != 1:
                return False  # AC scans are single-component by spec
            return self._ac_scan(
                scan_comps[0], ss, se, ah, al, huff_ac,
                restart_interval, segments,
            )
        except (EOFError, ValueError, IndexError, OverflowError):
            return False

    def _dc_scan(self, scan_comps, ah, al, huff_dc,
                 restart_interval, segments) -> bool:
        comps = [
            (cid, *self.comp_geom[cid], td) for cid, td, _ta in scan_comps
        ]
        interleaved = len(comps) > 1
        dc_pred = {cid: 0 for cid, *_ in comps}
        seg_idx = 0
        reader = _BitReader(segments[0])
        unit = 0  # MCU counter (interleaved) or block counter (single)
        if interleaved:
            mcus = [(my, mx) for my in range(self.mcus_y)
                    for mx in range(self.mcus_x)]
        else:
            cid = comps[0][0]
            bh, bw = self.true_blocks[cid]
            mcus = [(by, bx) for by in range(bh) for bx in range(bw)]
        for my, mx in mcus:
            if restart_interval and unit and unit % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    return False
                reader = _BitReader(segments[seg_idx])
                dc_pred = {c: 0 for c in dc_pred}
            for cid, hh, vv, _tq, td in comps:
                blocks = (
                    [(my * vv + by, mx * hh + bx)
                     for by in range(vv) for bx in range(hh)]
                    if interleaved
                    else [(my, mx)]
                )
                for gy, gx in blocks:
                    cblk = self.coef[cid][gy, gx]
                    if ah == 0:  # first DC scan
                        lut = huff_dc.get(td)
                        if lut is None:
                            return False
                        s = reader.read_symbol(lut)
                        diff = _extend(reader.read_bits(s), s)
                        dc_pred[cid] += diff
                        # Same corrupt-stream guard as the baseline
                        # path: a DC predictor past +-2^15 cannot come
                        # from a legal stream; bail before the int32
                        # store (shifted by al) overflows.
                        if abs(dc_pred[cid]) > 1 << 15:
                            return False
                        cblk[0] = dc_pred[cid] << al
                    else:  # refinement: one correction bit per block
                        if reader.read_bit():
                            cblk[0] |= 1 << al
            unit += 1
        return True

    def _ac_scan(self, scan_comp, ss, se, ah, al, huff_ac,
                 restart_interval, segments) -> bool:
        cid, _td, ta = scan_comp
        lut = huff_ac.get(ta)
        if lut is None:
            return False
        bh, bw = self.true_blocks[cid]
        seg_idx = 0
        reader = _BitReader(segments[0])
        self.eobrun = 0
        unit = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and unit and unit % restart_interval == 0:
                    seg_idx += 1
                    if seg_idx >= len(segments):
                        return False
                    reader = _BitReader(segments[seg_idx])
                    self.eobrun = 0
                unit += 1
                cblk = self.coef[cid][by, bx]
                if ah == 0:
                    self._ac_first(cblk, reader, lut, ss, se, al)
                else:
                    self._ac_refine(cblk, reader, lut, ss, se, al)
        return True

    def _ac_first(self, cblk, reader, lut, ss, se, al) -> None:
        if self.eobrun > 0:
            self.eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = reader.read_symbol(lut)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                self.eobrun = (1 << r) - 1
                if r:
                    self.eobrun += reader.read_bits(r)
                return
            k += r
            if k > se:
                raise ValueError("AC coefficient index past Se")
            cblk[_ZIGZAG[k]] = _extend(reader.read_bits(s), s) << al
            k += 1

    def _ac_refine(self, cblk, reader, lut, ss, se, al) -> None:
        p1 = 1 << al
        m1 = -1 << al
        k = ss
        if self.eobrun == 0:
            while k <= se:
                rs = reader.read_symbol(lut)
                r, s = rs >> 4, rs & 0x0F
                val = 0
                if s == 0:
                    if r != 15:  # EOBn: end-of-band run starts here
                        self.eobrun = 1 << r
                        if r:
                            self.eobrun += reader.read_bits(r)
                        break
                    # r == 15 (ZRL): skip 16 zero-history positions below
                else:
                    if s != 1:
                        raise ValueError("AC refinement size must be 1")
                    val = p1 if reader.read_bit() else m1
                # advance over r zero-history positions, emitting correction
                # bits for every nonzero-history coefficient passed over
                while k <= se:
                    c = _ZIGZAG[k]
                    if cblk[c] != 0:
                        if reader.read_bit():
                            if (cblk[c] & p1) == 0:
                                cblk[c] += p1 if cblk[c] >= 0 else m1
                    else:
                        if r == 0:
                            if val:
                                cblk[c] = val
                            break
                        r -= 1
                    k += 1
                k += 1
        if self.eobrun > 0:
            # inside an EOB run: only correction bits for the remainder
            while k <= se:
                c = _ZIGZAG[k]
                if cblk[c] != 0:
                    if reader.read_bit():
                        if (cblk[c] & p1) == 0:
                            cblk[c] += p1 if cblk[c] >= 0 else m1
                k += 1
            self.eobrun -= 1

    def finish(self, qt):
        h_img, w_img, comps = self.frame
        planes = {}
        for cid, hh, vv, tq in comps:
            q = qt.get(tq)
            if q is None:
                return None
            grid = self.coef[cid]
            by, bx = grid.shape[0], grid.shape[1]
            plane = np.zeros((by * 8, bx * 8), np.float64)
            qflat = q.reshape(64).astype(np.int64)
            for gy in range(by):
                for gx in range(bx):
                    block = (grid[gy, gx] * qflat).reshape(8, 8)
                    plane[gy * 8 : gy * 8 + 8, gx * 8 : gx * 8 + 8] = _idct(
                        block.astype(np.float64)
                    )
            planes[cid] = plane
        return _planes_to_image(self.frame, planes)


# ---------------------------------------------------------------------------
# Encoder (fixture generator + re-encode leg)
# ---------------------------------------------------------------------------

# encoder Huffman tables: canonical, fixed-length (simple and spec-legal —
# the tables travel in DHT, so nothing assumes Annex K defaults).
# DC: 12 categories, all 4-bit codes (codes 0..11; all-ones 1111 unused).
_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_ENC_DC_VALS = list(range(12))
# AC: EOB, ZRL and (run 0-15, size 1-10), all 8-bit codes (162 < 255).
_ENC_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_ENC_AC_BITS = [0] * 7 + [len(_ENC_AC_VALS)] + [0] * 8
_ENC_DC_LUT = _build_encode_lut(_ENC_DC_BITS, _ENC_DC_VALS)
_ENC_AC_LUT = _build_encode_lut(_ENC_AC_BITS, _ENC_AC_VALS)


class _BitWriter:
    """MSB-first bit writer with 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, length: int, code: int) -> None:
        for shift in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> shift) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        """Pad the final partial byte with 1-bits (T.81 F.1.2.3)."""
        if self.nbits:
            self.write(8 - self.nbits, (1 << (8 - self.nbits)) - 1)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(
    w: _BitWriter, block: np.ndarray, q: np.ndarray, dc_pred: int
) -> int:
    """FDCT → quantize → Huffman-encode one 8x8 block; returns new DC."""
    coeffs = _fdct(block)
    zz = np.rint(coeffs.reshape(64)[_ZIGZAG] / q.reshape(64)[_ZIGZAG]).astype(
        np.int64
    )
    dc = int(zz[0])
    diff = dc - dc_pred
    s = _category(diff)
    w.write(*_ENC_DC_LUT[s])
    if s:
        w.write(s, diff if diff >= 0 else diff + (1 << s) - 1)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        if k > last_nz:
            w.write(*_ENC_AC_LUT[0x00])  # EOB
            break
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            w.write(*_ENC_AC_LUT[0xF0])  # ZRL
            run -= 16
        s = _category(v)
        w.write(*_ENC_AC_LUT[(run << 4) | s])
        w.write(s, v if v >= 0 else v + (1 << s) - 1)
        run = 0
    return dc


def _sos_header(scan_cids: list[int], ss: int, se: int, ah: int, al: int,
                dc_tbl: int = 0, ac_tbl: int = 0) -> bytes:
    h = bytearray(b"\xff\xda")
    h += struct.pack(">H", 6 + 2 * len(scan_cids))
    h += bytes([len(scan_cids)])
    for cid in scan_cids:
        h += bytes([cid, (dc_tbl << 4) | ac_tbl])
    h += bytes([ss, se, (ah << 4) | al])
    return bytes(h)


def _write_extend(w: _BitWriter, s: int, v: int) -> None:
    if s:
        w.write(s, v if v >= 0 else v + (1 << s) - 1)


def _encode_progressive_scans(padded, comps, qtab, h_img, w_img) -> bytes:
    """Emit a fixed progressive scan script over pre-quantized coefficient
    grids: interleaved DC first (Al=1) + DC refinement, then per component
    two spectral AC bands (Ss 1-20, 21-63) at Al=1 followed by their
    successive-approximation refinements. The AC refinement emitter follows
    the public libjpeg structure (encode_mcu_AC_refine): ZRLs drained at
    every nonzero position before buffering, correction bits flushed after
    each emitted symbol, trailing run + bits folded into a per-block EOB."""
    qflat = qtab.reshape(64)[_ZIGZAG].astype(np.float64)
    grids = {}
    for plane, (cid, _hh, _vv, _tq) in zip(padded, comps):
        by, bx = plane.shape[0] // 8, plane.shape[1] // 8
        g = np.zeros((by, bx, 64), np.int64)
        for gy in range(by):
            for gx in range(bx):
                c = _fdct(plane[gy * 8 : gy * 8 + 8, gx * 8 : gx * 8 + 8])
                g[gy, gx] = np.rint(c.reshape(64)[_ZIGZAG] / qflat).astype(
                    np.int64
                )
        grids[cid] = g
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    out = bytearray()
    al = 1

    def _mcu_blocks():
        """(cid, gy, gx) in interleaved MCU traversal order."""
        mcus_y = grids[comps[0][0]].shape[0] // comps[0][2]
        mcus_x = grids[comps[0][0]].shape[1] // comps[0][1]
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for cid, hh, vv, _tq in comps:
                    for by in range(vv):
                        for bx in range(hh):
                            yield cid, my * vv + by, mx * hh + bx

    # --- scan 1: DC first, interleaved, successive approximation Al=1
    out += _sos_header([c[0] for c in comps], 0, 0, 0, al)
    w = _BitWriter()
    pred = {c[0]: 0 for c in comps}
    for cid, gy, gx in _mcu_blocks():
        dc = int(grids[cid][gy, gx, 0]) >> al  # arithmetic shift per T.81
        diff = dc - pred[cid]
        pred[cid] = dc
        s = _category(diff)
        w.write(*_ENC_DC_LUT[s])
        _write_extend(w, s, diff)
    w.flush()
    out += w.out
    # --- scan 2: DC refinement (one bit per block)
    out += _sos_header([c[0] for c in comps], 0, 0, al, 0)
    w = _BitWriter()
    for cid, gy, gx in _mcu_blocks():
        w.write(1, int(grids[cid][gy, gx, 0]) & 1)
    w.flush()
    out += w.out

    bands = [(1, 20), (21, 63)]
    for cid, hh, vv, _tq in comps:
        g = grids[cid]
        # AC scans iterate TRUE block dims — ceil(ceil(dim·f/fmax)/8), same
        # as the decoder; MCU-padding-only blocks carry DC but no AC rows
        bw = -(-(-(-w_img * hh // hmax)) // 8)
        bh = -(-(-(-h_img * vv // vmax)) // 8)
        for ss, se in bands:
            # first pass at Al=1
            out += _sos_header([cid], ss, se, 0, al)
            w = _BitWriter()
            for gy in range(bh):
                for gx in range(bw):
                    zz = g[gy, gx]
                    run = 0
                    for k in range(ss, se + 1):
                        a = abs(int(zz[k])) >> al
                        if a == 0:
                            run += 1
                            continue
                        while run >= 16:
                            w.write(*_ENC_AC_LUT[0xF0])
                            run -= 16
                        s = _category(a)
                        w.write(*_ENC_AC_LUT[(run << 4) | s])
                        v = a if zz[k] >= 0 else -a
                        _write_extend(w, s, v)
                        run = 0
                    if run:
                        w.write(*_ENC_AC_LUT[0x00])  # EOB, run of 1
            w.flush()
            out += w.out
        for ss, se in bands:
            # refinement pass Ah=1 → Al=0
            out += _sos_header([cid], ss, se, al, 0)
            w = _BitWriter()
            for gy in range(bh):
                for gx in range(bw):
                    zz = g[gy, gx]
                    absv = [abs(int(zz[k])) for k in range(ss, se + 1)]
                    newly = [k for k in range(ss, se + 1)
                             if absv[k - ss] == 1]
                    eob_k = newly[-1] if newly else ss - 1
                    run = 0
                    bits: list[int] = []
                    for k in range(ss, se + 1):
                        t = absv[k - ss]
                        if t == 0:
                            run += 1
                            continue
                        while run > 15 and k <= eob_k:
                            w.write(*_ENC_AC_LUT[0xF0])
                            run -= 16
                            for bit in bits:
                                w.write(1, bit)
                            bits = []
                        if t > 1:  # history coefficient: correction bit
                            bits.append(t & 1)
                            continue
                        # newly significant (|coef| == 1 at this precision)
                        w.write(*_ENC_AC_LUT[(run << 4) | 1])
                        run = 0
                        w.write(1, 1 if zz[k] > 0 else 0)
                        for bit in bits:
                            w.write(1, bit)
                        bits = []
                    if run or bits:
                        w.write(*_ENC_AC_LUT[0x00])  # EOB
                        for bit in bits:
                            w.write(1, bit)
            w.flush()
            out += w.out
    return bytes(out)


def _pad_to(plane: np.ndarray, by: int, bx: int) -> np.ndarray:
    """Edge-replicate pad so both dims are multiples of (by, bx)."""
    h, w = plane.shape
    ph = (-h) % by
    pw = (-w) % bx
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def encode_jpeg_baseline(
    px: np.ndarray,
    q: int = 8,
    subsample_420: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Encode uint8 pixels (HxWx3 BGR, or HxW grayscale) as a baseline
    sequential JPEG. Flat quantization value ``q`` for every coefficient
    (q=8 makes the DC of a flat integer-valued image exactly recoverable —
    the property the differential oracle relies on). ``subsample_420``
    emits 2x2-subsampled chroma; ``restart_interval`` > 0 emits DRI/RSTn
    every that many MCUs. ``progressive`` emits an SOF2 stream instead —
    DC first + refinement, then two spectral AC bands per component, each
    with one successive-approximation refinement pass (exercises the full
    progressive decode machinery; not compatible with restart_interval)."""
    assert not (progressive and restart_interval), (
        "progressive encoder does not emit restart markers"
    )
    gray = px.ndim == 2
    h_img, w_img = px.shape[:2]
    qtab = np.full((8, 8), q, np.int32)
    if gray:
        planes = [px.astype(np.float64) - 128.0]
        comps = [(1, 1, 1, 0)]
    else:
        bch = px[..., 0].astype(np.float64)
        gch = px[..., 1].astype(np.float64)
        rch = px[..., 2].astype(np.float64)
        y = 0.299 * rch + 0.587 * gch + 0.114 * bch
        cb = -0.168736 * rch - 0.331264 * gch + 0.5 * bch + 128.0
        cr = 0.5 * rch - 0.418688 * gch - 0.081312 * bch + 128.0
        if subsample_420:
            ph = _pad_to(cb, 2, 2)
            cb = ph.reshape(ph.shape[0] // 2, 2, ph.shape[1] // 2, 2).mean((1, 3))
            ph = _pad_to(cr, 2, 2)
            cr = ph.reshape(ph.shape[0] // 2, 2, ph.shape[1] // 2, 2).mean((1, 3))
            comps = [(1, 2, 2, 0), (2, 1, 1, 0), (3, 1, 1, 0)]
        else:
            comps = [(1, 1, 1, 0), (2, 1, 1, 0), (3, 1, 1, 0)]
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))
    padded = [
        _pad_to(p, mcus_y * vv * 8, mcus_x * hh * 8)
        for p, (_cid, hh, vv, _tq) in zip(planes, comps)
    ]

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HH", 1, 1) + b"\x00\x00"  # APP0, no thumbnail
    zz_q = np.zeros(64, np.uint8)
    zz_q[np.arange(64)] = qtab.reshape(64)[_ZIGZAG]
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q.tobytes()
    sof = b"\xff\xc2" if progressive else b"\xff\xc0"
    out += sof + struct.pack(">H", 8 + 3 * len(comps)) + b"\x08"
    out += struct.pack(">HH", h_img, w_img) + bytes([len(comps)])
    for cid, hh, vv, tq in comps:
        out += bytes([cid, (hh << 4) | vv, tq])
    out += (
        b"\xff\xc4"
        + struct.pack(">H", 2 + 1 + 16 + len(_ENC_DC_VALS))
        + b"\x00"
        + bytes(_ENC_DC_BITS)
        + bytes(_ENC_DC_VALS)
    )
    out += (
        b"\xff\xc4"
        + struct.pack(">H", 2 + 1 + 16 + len(_ENC_AC_VALS))
        + b"\x10"
        + bytes(_ENC_AC_BITS)
        + bytes(_ENC_AC_VALS)
    )
    if progressive:
        out += _encode_progressive_scans(padded, comps, qtab, h_img, w_img)
        out += b"\xff\xd9"  # EOI
        return bytes(out)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * len(comps))
    out += bytes([len(comps)])
    for cid, *_ in comps:
        out += bytes([cid, 0x00])  # DC table 0, AC table 0
    out += b"\x00\x3f\x00"  # Ss=0, Se=63, Ah/Al=0

    w = _BitWriter()
    dc_pred = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    rst_idx = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                w.flush()
                out += w.out
                w = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst_idx % 8)])
                rst_idx += 1
                dc_pred = {cid: 0 for cid in dc_pred}
            for plane, (cid, hh, vv, _tq) in zip(padded, comps):
                for by in range(vv):
                    for bx in range(hh):
                        y0, x0 = (my * vv + by) * 8, (mx * hh + bx) * 8
                        dc_pred[cid] = _encode_block(
                            w, plane[y0 : y0 + 8, x0 : x0 + 8], qtab,
                            dc_pred[cid],
                        )
            mcu_count += 1
    w.flush()
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
