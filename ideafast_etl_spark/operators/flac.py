"""From-spec FLAC decoder + encoder (RFC 9639 / the public FLAC format
spec) — closes the compressed-audio leg of SURVEY.md §2.13 without any
external codec library (the container has no libFLAC/ffmpeg).

Decoder coverage: STREAMINFO + metadata-block walk, fixed & variable
blocking, all block-size/sample-rate header encodings, CRC-8 (header) and
CRC-16 (frame) verification, subframe types CONSTANT / VERBATIM / FIXED
(orders 0-4) / LPC (orders 1-32), wasted-bits, Rice residual coding (both
4- and 5-bit parameter methods, partition orders, escape-to-raw), and the
four channel assignments (independent, left/side, right/side, mid/side).
Returns None for malformed/unsupported input — never raises (untrusted
binary column contract, same as ``jpeg.py``/``avi.py``).

Encoder: 16-bit, fixed block size, per-block subframe choice (CONSTANT
for flat runs, else best of FIXED orders 0-2 by residual magnitude, with
VERBATIM as the bound), Rice partition order 0, optional left/side or
mid/side stereo decorrelation — enough surface to exercise every decoder
path and to produce real FLAC files any player accepts.

Like the sibling codecs, the per-sample Python loops are NOT presented as
a 100 TB hot path: decode runs executor-side inside Arrow ``mapInPandas``
batches (`operators/multimodal.py`), and swapping in a native decoder
changes one function. Reference analog: the binary-asset leg S2
(`ideafast_etl/hooks/drm.py:48-90`).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCK_SIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                13: 8192, 14: 16384, 15: 32768}

_SAMPLE_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                 6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                 11: 96000}

_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — frame-header CRC."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — whole-frame CRC."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitReader:
    """MSB-first bit reader over bytes."""

    def __init__(self, data: bytes, byte_pos: int = 0):
        self.data = data
        self.pos = byte_pos  # byte position
        self.bit = 0  # bits consumed in current byte (0-7)

    def eof(self) -> bool:
        return self.pos >= len(self.data)

    def read(self, n: int) -> int:
        v = 0
        while n > 0:
            if self.pos >= len(self.data):
                raise EOFError("truncated FLAC bitstream")
            avail = 8 - self.bit
            take = min(n, avail)
            byte = self.data[self.pos]
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
            n -= take
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        """Count of 0 bits before the terminating 1 bit."""
        q = 0
        while True:
            if self.read(1):
                return q
            q += 1
            if q > 1 << 20:  # corrupt-stream guard
                raise ValueError("unterminated unary code")

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _read_coded_number(r: _BitReader) -> int:
    """The UTF-8-style frame/sample number (up to 7 bytes / 36 bits)."""
    first = r.read(8)
    if first < 0x80:
        return first
    n_follow = 0
    mask = 0x40
    while first & mask:
        n_follow += 1
        mask >>= 1
    if n_follow < 1 or n_follow > 6:
        raise ValueError("invalid coded number")
    v = first & (mask - 1)
    for _ in range(n_follow):
        b = r.read(8)
        if b >> 6 != 0b10:
            raise ValueError("invalid coded-number continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _read_residual(r: _BitReader, block_size: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    n_part = 1 << porder
    if block_size % n_part:
        raise ValueError("block size not divisible by rice partitions")
    out: list[int] = []
    for p in range(n_part):
        count = block_size >> porder
        if p == 0:
            count -= order
        if count < 0:
            raise ValueError("invalid rice partitioning")
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            if raw == 0:
                out.extend(0 for _ in range(count))
            else:
                out.extend(r.read_signed(raw) for _ in range(count))
        else:
            for _ in range(count):
                q = r.read_unary()
                v = (q << param) | (r.read(param) if param else 0)
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _read_subframe(r: _BitReader, block_size: int, bps: int) -> list[int]:
    if r.read(1):
        raise ValueError("subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
    ebps = bps - wasted
    if stype == 0:  # CONSTANT
        v = r.read_signed(ebps)
        samples = [v] * block_size
    elif stype == 1:  # VERBATIM
        samples = [r.read_signed(ebps) for _ in range(block_size)]
    elif 8 <= stype <= 12:  # FIXED, order 0-4
        order = stype - 8
        warm = [r.read_signed(ebps) for _ in range(order)]
        res = _read_residual(r, block_size, order)
        samples = warm[:]
        coefs = _FIXED_COEFS[order]
        for i in range(order, block_size):
            pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            samples.append(res[i - order] + pred)
    elif stype >= 32:  # LPC, order 1-32
        order = (stype & 31) + 1
        warm = [r.read_signed(ebps) for _ in range(order)]
        prec = r.read(4)
        if prec == 0xF:
            raise ValueError("invalid LPC precision")
        prec += 1
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        res = _read_residual(r, block_size, order)
        samples = warm[:]
        for i in range(order, block_size):
            pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            samples.append(res[i - order] + (pred >> shift))
    else:
        raise ValueError(f"reserved subframe type {stype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(b: bytes) -> tuple[int, int, np.ndarray] | None:
    """Decode FLAC bytes into (sample_rate, n_channels, float64 samples in
    [-1, 1], shape (n_frames, n_channels)) — the same contract as
    ``multimodal.decode_wav``. None for non-FLAC/unsupported/corrupt."""
    try:
        return _decode(b)
    except (struct.error, IndexError, ValueError, EOFError, OverflowError):
        return None


def _decode(b: bytes) -> tuple[int, int, np.ndarray] | None:
    if len(b) < 42 or b[:4] != b"fLaC":
        return None
    pos = 4
    streaminfo = None
    while pos + 4 <= len(b):  # metadata blocks
        hdr = b[pos]
        btype = hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + b[pos + 1 : pos + 4])
        if btype == 0:
            si = b[pos + 4 : pos + 4 + blen]
            if len(si) < 34:
                return None
            rate = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
            nch = ((si[12] >> 1) & 0x07) + 1
            bps = (((si[12] & 1) << 4) | (si[13] >> 4)) + 1
            total = ((si[13] & 0x0F) << 32) | struct.unpack(
                ">I", si[14:18]
            )[0]
            streaminfo = (rate, nch, bps, total)
        pos += 4 + blen
        if hdr & 0x80:  # last-metadata-block flag
            break
    if streaminfo is None:
        return None
    rate, nch, bps, total = streaminfo
    if rate == 0 or nch < 1:
        return None
    channels: list[list[int]] = [[] for _ in range(nch)]
    while pos < len(b) - 2:
        r = _BitReader(b, pos)
        sync = r.read(14)
        if sync != 0x3FFE:
            return None
        if r.read(1):
            raise ValueError("reserved frame-header bit")
        r.read(1)  # blocking strategy (number semantics only)
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        if r.read(1):
            raise ValueError("reserved frame-header bit")
        _read_coded_number(r)
        if bs_code == 0:
            raise ValueError("reserved block size")
        elif bs_code == 6:
            block_size = r.read(8) + 1
        elif bs_code == 7:
            block_size = r.read(16) + 1
        else:
            block_size = _BLOCK_SIZES[bs_code]
        if sr_code == 0:
            pass
        elif sr_code in _SAMPLE_RATES:
            pass
        elif sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        else:
            raise ValueError("invalid sample-rate code")
        fbps = bps if ss_code == 0 else _SAMPLE_SIZES.get(ss_code)
        if fbps is None:
            raise ValueError("reserved sample size")
        crc_pos = r.pos  # header CRC covers sync..here (byte-aligned)
        if r.bit:
            raise ValueError("frame header not byte-aligned before CRC")
        if _crc8(b[pos:crc_pos]) != r.read(8):
            raise ValueError("frame-header CRC mismatch")
        # subframes
        if ch_code < 8:
            if ch_code + 1 != nch:
                raise ValueError("channel-count mismatch")
            subs = [_read_subframe(r, block_size, fbps) for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            if nch != 2:
                raise ValueError("stereo decorrelation on non-stereo stream")
            if ch_code == 8:  # left/side
                left = _read_subframe(r, block_size, fbps)
                side = _read_subframe(r, block_size, fbps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side: ch0=side, ch1=right
                side = _read_subframe(r, block_size, fbps + 1)
                right = _read_subframe(r, block_size, fbps)
                subs = [[rr + s for rr, s in zip(right, side)], right]
            else:  # mid/side
                mid = _read_subframe(r, block_size, fbps)
                side = _read_subframe(r, block_size, fbps + 1)
                l_ch, r_ch = [], []
                for m, s in zip(mid, side):
                    m2 = (m << 1) | (s & 1)
                    l_ch.append((m2 + s) >> 1)
                    r_ch.append((m2 - s) >> 1)
                subs = [l_ch, r_ch]
        else:
            raise ValueError("reserved channel assignment")
        r.align()
        frame_crc = r.read(16)
        if _crc16(b[pos : r.pos - 2]) != frame_crc:
            raise ValueError("frame CRC mismatch")
        for c in range(nch):
            channels[c].extend(subs[c])
        pos = r.pos
    n = len(channels[0])
    if total:
        n = min(n, total)
    if n == 0:
        return None
    x = np.array([ch[:n] for ch in channels], dtype=np.float64).T
    return rate, nch, x / float(1 << (bps - 1))


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _coded_number(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    out = []
    n_follow = 1
    while v >= (1 << (6 - n_follow)) << (6 * n_follow):
        n_follow += 1
    head = (0xFF << (7 - n_follow)) & 0xFF | (v >> (6 * n_follow))
    out.append(head)
    for i in range(n_follow - 1, -1, -1):
        out.append(0x80 | ((v >> (6 * i)) & 0x3F))
    return bytes(out)


def _best_rice_param(res: list[int]) -> int:
    if not res:
        return 0
    mean = sum(abs(x) for x in res) / len(res)
    p = 0
    while (1 << p) < mean and p < 14:
        p += 1
    return p


def _write_residual(w: _BitWriter, res: list[int]) -> None:
    """Rice method 0, partition order 0, escape when raw is cheaper."""
    param = _best_rice_param(res)
    zz = [((x << 1) if x >= 0 else ((-x) << 1) - 1) for x in res]
    rice_bits = sum((z >> param) + 1 + param for z in zz)
    maxmag = max((abs(x) for x in res), default=0)
    raw_bits_per = max(2, maxmag.bit_length() + 1)
    if raw_bits_per < 31 and raw_bits_per * len(res) < rice_bits:
        w.write(0, 2)
        w.write(0, 4)
        w.write(0xF, 4)  # escape
        w.write(raw_bits_per, 5)
        for x in res:
            w.write(x & ((1 << raw_bits_per) - 1), raw_bits_per)
        return
    w.write(0, 2)  # rice, 4-bit params
    w.write(0, 4)  # partition order 0
    w.write(param, 4)
    for z in zz:
        w.write_unary(z >> param)
        if param:
            w.write(z & ((1 << param) - 1), param)


def _encode_subframe(
    w: _BitWriter, samples: list[int], bps: int, force: str | None = None
) -> None:
    n = len(samples)
    if force != "verbatim" and all(s == samples[0] for s in samples):
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)  # no wasted bits
        w.write(samples[0] & ((1 << bps) - 1), bps)
        return
    if force == "verbatim" or n < 5:
        w.write(0, 1)
        w.write(1, 6)  # VERBATIM
        w.write(0, 1)
        for s in samples:
            w.write(s & ((1 << bps) - 1), bps)
        return
    if force == "lpc":
        # order-2 LPC, coefficients (2, -1) scaled by shift 4 — numerically
        # the FIXED-order-2 predictor, emitted through the LPC subframe
        # machinery (precision/shift/coefficient fields + residual), so the
        # decoder's LPC path gets real end-to-end coverage
        order, prec, shift, coefs = 2, 7, 4, [2 << 4, -(1 << 4)]
        res = [
            samples[i]
            - ((sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))) >> shift)
            for i in range(order, n)
        ]
        w.write(0, 1)
        w.write(32 | (order - 1), 6)  # LPC
        w.write(0, 1)
        for s in samples[:order]:
            w.write(s & ((1 << bps) - 1), bps)
        w.write(prec - 1, 4)
        w.write(shift, 5)
        for c in coefs:
            w.write(c & ((1 << prec) - 1), prec)
        _write_residual(w, res)
        return
    # FIXED: pick the order 0-2 minimising total |residual|
    best_order, best_res, best_cost = 0, samples, sum(abs(x) for x in samples)
    for order in (1, 2):
        coefs = _FIXED_COEFS[order]
        res = [
            samples[i]
            - sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, n)
        ]
        cost = sum(abs(x) for x in res)
        if cost < best_cost:
            best_order, best_res, best_cost = order, res, cost
    order = best_order
    res = best_res if order else samples
    w.write(0, 1)
    w.write(8 + order, 6)  # FIXED
    w.write(0, 1)
    for s in samples[:order]:
        w.write(s & ((1 << bps) - 1), bps)
    _write_residual(w, list(res))


def encode_flac(
    samples: np.ndarray,
    rate: int,
    block_size: int = 4096,
    stereo_mode: str = "independent",
    force_subframe: str | None = None,
) -> bytes:
    """(n_frames, n_channels) float in [-1,1] → 16-bit FLAC bytes.
    ``stereo_mode``: independent | left-side | mid-side (2ch only).
    ``force_subframe``: None (auto) | 'verbatim' — test hook."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).round().astype(np.int64)
    n, nch = pcm.shape
    bps = 16
    md5 = hashlib.md5(pcm.astype("<i2").tobytes()).digest()
    # STREAMINFO
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)
    si += b"\x00\x00\x00" * 2  # min/max frame size unknown
    si += bytes(
        [
            (rate >> 12) & 0xFF,
            (rate >> 4) & 0xFF,
            ((rate & 0xF) << 4) | ((nch - 1) << 1) | ((bps - 1) >> 4),
            (((bps - 1) & 0xF) << 4) | ((n >> 32) & 0xF),
        ]
    )
    si += struct.pack(">I", n & 0xFFFFFFFF)
    si += md5
    out = bytearray(b"fLaC")
    out.append(0x80)  # last metadata block, type 0
    out += len(si).to_bytes(3, "big")
    out += si
    for f_idx, start in enumerate(range(0, n, block_size)):
        blk = pcm[start : start + block_size]
        bs = blk.shape[0]
        hdr = bytearray()
        hdr += b"\xff\xf8"  # sync + fixed blocking
        bs_code = next(
            (k for k, v in _BLOCK_SIZES.items() if v == bs), 7
        )
        sr_code = next(
            (k for k, v in _SAMPLE_RATES.items() if v == rate), 13
        )
        if stereo_mode == "left-side" and nch == 2:
            ch_code = 8
        elif stereo_mode == "mid-side" and nch == 2:
            ch_code = 10
        else:
            ch_code = nch - 1
        hdr.append((bs_code << 4) | sr_code)
        hdr.append((ch_code << 4) | (4 << 1))  # sample size 16 (100)
        hdr += _coded_number(f_idx)
        if bs_code == 7:
            hdr += struct.pack(">H", bs - 1)
        if sr_code == 13:
            hdr += struct.pack(">H", rate)
        hdr.append(_crc8(bytes(hdr)))
        w = _BitWriter()
        if ch_code == 8:
            left = blk[:, 0].tolist()
            side = (blk[:, 0] - blk[:, 1]).tolist()
            _encode_subframe(w, left, bps, force_subframe)
            _encode_subframe(w, side, bps + 1, force_subframe)
        elif ch_code == 10:
            l_ch, r_ch = blk[:, 0], blk[:, 1]
            side = (l_ch - r_ch).tolist()
            mid = ((l_ch + r_ch) >> 1).tolist()
            _encode_subframe(w, mid, bps, force_subframe)
            _encode_subframe(w, side, bps + 1, force_subframe)
        else:
            for c in range(nch):
                _encode_subframe(w, blk[:, c].tolist(), bps, force_subframe)
        w.align()
        frame = bytes(hdr) + w.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)
