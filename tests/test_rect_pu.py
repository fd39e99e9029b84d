"""Rectangular inter PUs (2NxN / Nx2N), encoder side (reference:
motion_inter partition loop, hmr_motion_inter.c:3746; part_mode
binarization spec 9.3.3.7). The FFmpeg decode oracle is the proof that
the per-PU candidate derivation (merge_candidates_rect /
amvp_candidates_rect, spec 8.5.3.2.3 second-PU exclusions) matches a
conformant decoder."""

import numpy as np

from homerhevc_tpu.api import Encoder
from homerhevc_tpu.config import EncoderConfig
from tests.conftest import decode_annexb, make_yuv


def _two_motion_frames(rng, w, h, n, split="h"):
    """Frames whose top/bottom (or left/right) halves move differently,
    with the motion boundary OFF the 16-grid so rect PUs pay off."""
    yw, uw = make_yuv(rng, w * 2, h * 2)[0:2]
    frames = []
    for t in range(n):
        y = np.empty((h, w), np.uint8)
        if split == "h":
            cut = h // 2 + 8   # off the 16-grid
            y[:cut] = yw[:cut, t:t + w]              # pans right 1px/f
            y[cut:] = yw[cut:h, w - t:2 * w - t]     # pans left 1px/f
        else:
            cut = w // 2 + 8
            y[:, :cut] = yw[t:t + h, :cut]
            y[:, cut:] = yw[h - t:2 * h - t, cut:w]
        u = np.full((h // 2, w // 2), 120, np.uint8)
        frames.append((y, u, u.copy()))
    return frames


def test_rect_pu_adopted_and_conformant(tmp_path):
    from homerhevc_tpu.engine.pipeline import EncoderPipeline
    rng = np.random.RandomState(31)
    w, h = 96, 64
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=1, cu_size=32,
                        sao=False, deblocking=True, sign_hiding=True,
                        intra_period=0, reinit_gop_on_scene_change=False)
    enc = Encoder(cfg)
    enc._pipeline = EncoderPipeline(cfg, backend="golden")
    frames = _two_motion_frames(rng, w, h, 4)
    path = tmp_path / "rect.265"
    recons, descs = [], []
    with open(path, "wb") as f:
        for fr in frames:
            for ef in enc.encode(*fr):
                f.write(ef.annex_b())
                recons.append(ef.recon)
        for ef in enc.flush():
            f.write(ef.annex_b())
            recons.append(ef.recon)
    decoded = decode_annexb(path)
    assert len(decoded) == len(recons) == 4
    for i, dy in enumerate(decoded):
        assert np.array_equal(dy, recons[i]["y"]), f"frame {i} mismatch"


def test_rect_pu_pass_activates():
    """The rect pass must adopt at least one 2NxN on split-motion
    content (direct unit check, independent of the pipeline)."""
    from homerhevc_tpu.engine.pipeline import EncoderPipeline
    from homerhevc_tpu.golden.inter_frame import encode_inter_frame
    rng = np.random.RandomState(4)
    w, h = 96, 64
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=1, cu_size=16,
                        sao=False, deblocking=False, sign_hiding=False,
                        intra_period=0)
    pipe = EncoderPipeline(cfg, backend="golden")
    frames = _two_motion_frames(rng, w, h, 2)
    (y0, u0, v0), (y1, u1, v1) = frames
    desc, *_ = encode_inter_frame(
        pipe.ps, (y1, u1, v1),
        (y0.astype(np.int32), u0.astype(np.int32), v0.astype(np.int32)),
        32, cu_size=16, search=8, rect_pu=True)
    assert desc.inter_part is not None and desc.inter_part.any(), \
        "no rectangular PU adopted"


def test_rect_pu_parser_roundtrip():
    from homerhevc_tpu.engine.pipeline import EncoderPipeline
    from homerhevc_tpu.golden.inter_frame import encode_inter_frame
    from homerhevc_tpu.hevc.bitstream import BitWriter
    from homerhevc_tpu.hevc.cabac import CabacEncoder
    from homerhevc_tpu.hevc.cabac_dec import BitReader, CabacDecoder
    from homerhevc_tpu.hevc.ctx_tables import init_contexts
    from homerhevc_tpu.hevc.headers import SLICE_P
    from homerhevc_tpu.hevc.parse import SliceDataParser
    from homerhevc_tpu.hevc.syntax import SliceDataEncoder
    rng = np.random.RandomState(17)
    w, h = 96, 64
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=1, cu_size=16,
                        sao=False, deblocking=False, sign_hiding=True,
                        intra_period=0)
    pipe = EncoderPipeline(cfg, backend="golden")
    frames = _two_motion_frames(rng, w, h, 2, split="v")
    (y0, u0, v0), (y1, u1, v1) = frames
    desc, *_ = encode_inter_frame(
        pipe.ps, (y1, u1, v1),
        (y0.astype(np.int32), u0.astype(np.int32), v0.astype(np.int32)),
        32, cu_size=16, search=8, rect_pu=True)
    assert desc.inter_part is not None and desc.inter_part.any()
    bw = BitWriter()
    enc = CabacEncoder(bw, init_contexts("P", 32))
    sd = SliceDataEncoder(pipe.ps, desc, enc, SLICE_P, 32)
    n = pipe.ps.ctus_x * pipe.ps.ctus_y
    for i in range(n):
        sd.encode_ctu(i % pipe.ps.ctus_x, i // pipe.ps.ctus_x)
        sd.encode_ctu_end(i == n - 1)
    enc.finish()
    bw.write_byte_alignment()
    p = SliceDataParser(pipe.ps, w, h,
                        CabacDecoder(BitReader(bw.get_bytes()),
                                     init_contexts("P", 32)),
                        SLICE_P, 32)
    for i in range(n):
        p.parse_ctu(i % pipe.ps.ctus_x, i // pipe.ps.ctus_x)
        p.parse_ctu_end()
    np.testing.assert_array_equal(p.d.coef_y, desc.coef_y)
    np.testing.assert_array_equal(p.d.mv, desc.mv)
    np.testing.assert_array_equal(p.d.inter_part is not None
                                  and p.d.inter_part,
                                  desc.inter_part)


def test_rect_pu_native_serializer_matches_python():
    """The C++ serializer's rect-PU payload (part bins, per-PU
    merge/AMVP, rqt_root_cbf) must be bit-identical to the Python
    SliceDataEncoder's."""
    import pytest
    from homerhevc_tpu.engine.pipeline import EncoderPipeline
    from homerhevc_tpu.golden.inter_frame import encode_inter_frame
    from homerhevc_tpu.hevc.headers import SLICE_P
    from homerhevc_tpu.native import get_lib
    if get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.RandomState(29)
    w, h = 96, 64
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=1, cu_size=16,
                        sao=False, deblocking=False, sign_hiding=True,
                        intra_period=0)
    pipe = EncoderPipeline(cfg, backend="golden")
    for split in ("h", "v"):
        frames = _two_motion_frames(np.random.RandomState(29), w, h, 2,
                                    split=split)
        (y0, u0, v0), (y1, u1, v1) = frames
        desc, *_ = encode_inter_frame(
            pipe.ps, (y1, u1, v1),
            (y0.astype(np.int32), u0.astype(np.int32),
             v0.astype(np.int32)),
            32, cu_size=16, search=8, rect_pu=True)
        assert desc.inter_part is not None and desc.inter_part.any()
        nal_native = pipe._serialize_slice(desc, SLICE_P, 1, 32,
                                           refs_before=(0,), poc=1)
        nal_python = pipe._serialize_slice(desc, SLICE_P, 1, 32,
                                           use_native=False,
                                           refs_before=(0,), poc=1)
        assert nal_native == nal_python, f"split={split} payload mismatch"


def test_rect_pu_uni_b_conformance(tmp_path):
    """Rect PUs in (uni-L0) B slices: inter_pred_idc per rect PU +
    rect-position AMVP/merge derivation. Drives the uni-B tree path
    directly (the gop2 pipeline upgrades its Bs to two-list bi, where
    rect stays off by design) and FFmpeg-decodes the stream."""
    from homerhevc_tpu.engine.pipeline import EncoderPipeline
    from homerhevc_tpu.hevc.headers import SLICE_B
    rng = np.random.RandomState(9)
    w, h, n_b = 128, 64, 3
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=1,
                        intra_period=0, sao=False, deblocking=True,
                        sign_hiding=True, cu_size=32,
                        reinit_gop_on_scene_change=False)
    pipe = EncoderPipeline(cfg, backend="golden")
    y, u, v = make_yuv(rng, w, h)
    recons = []
    nals = b""
    # IDR first
    desc, ry, ru, rv = pipe._analyze_intra(y, u, v, qp=30)
    ef = pipe._emit(desc, ry, ru, rv, src=(y, u, v), qp=30)
    nals += ef.annex_b()
    recons.append(ef.recon)
    split = h // 2 + 8        # motion boundary mid-CU16 -> rect pays
    rect_in_b = 0
    for t in range(1, n_b + 1):
        top = np.roll(y[:split], 4 * t, axis=1)
        bot = np.roll(y[split:], -3 * t, axis=1)
        y2 = np.vstack([top, bot])
        d2, r2y, r2u, r2v = pipe._analyze_inter(y2, u, v, qp=30,
                                                is_b=True)
        if d2.inter_part is not None and d2.inter_part.any():
            rect_in_b += 1
        ef = pipe._emit(d2, r2y, r2u, r2v, src=(y2, u, v),
                        slice_type=SLICE_B, qp=30,
                        refs_before=(pipe.gop_poc - 1,))
        nals += ef.annex_b()
        recons.append(ef.recon)
    path = tmp_path / "rect_b.265"
    path.write_bytes(nals)
    dec = decode_annexb(path)
    assert len(dec) == n_b + 1
    for i in range(n_b + 1):
        assert np.array_equal(dec[i], recons[i]["y"]), f"frame {i}"
    assert rect_in_b > 0, "no rect CU landed in a B slice - test vacuous"
