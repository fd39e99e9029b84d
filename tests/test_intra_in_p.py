"""Per-CU intra fallback in P frames (cfg.intra_in_p): golden/device
bit-exactness + FFmpeg conformance. Reference analog: intra-vs-inter
comparison inside the CU walk, hmr_motion_inter.c:4008-4038."""

import numpy as np
import pytest

from homerhevc_tpu.config import EncoderConfig
from homerhevc_tpu.hevc.headers import ParamSets
from homerhevc_tpu.hevc.syntax import MODE_INTRA
from tests.conftest import decode_annexb, make_yuv


def _occlusion_pair(rng, w, h):
    """(frame1, frame2): global shift + a smooth new region that motion
    cannot predict but intra can."""
    y, u, v = make_yuv(rng, w, h)
    y2 = np.roll(y, 3, 1).astype(np.int32)
    yy, xx = np.mgrid[0:32, 0:64]
    y2[16:48, 32:96] = 200 - yy * 2 + xx // 4
    y2 = np.clip(y2, 0, 255).astype(np.uint8)
    u2 = np.roll(u, 1, 1)
    v2 = np.roll(v, 1, 1)
    return (y, u, v), (y2, u2, v2)


def test_select_intra_independent_no_adjacent():
    from homerhevc_tpu.golden.inter_frame import select_intra_independent
    rng = np.random.RandomState(7)
    want = rng.rand(9, 13) < 0.6
    sel = select_intra_independent(want)
    assert (sel <= want).all()
    p = np.pad(sel, 1)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            shifted = p[1 + dy:p.shape[0] - 1 + dy,
                        1 + dx:p.shape[1] - 1 + dx]
            assert not (sel & shifted).any(), f"adjacent picks at {dy},{dx}"


@pytest.mark.parametrize("cu,deblock", [(16, False), (16, True),
                                        (32, False), (32, True)])
def test_device_fallback_matches_golden(cu, deblock, rng):
    from homerhevc_tpu.engine.inter_encoder import TpuInterEncoder
    from homerhevc_tpu.golden.inter_frame import (
        encode_inter_frame, encode_inter_frame_tree)
    w, h = 128, 64
    (y, u, v), (y2, u2, v2) = _occlusion_pair(rng, w, h)
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=1, sao=False,
                        deblocking=deblock, cu_size=cu, intra_in_p=True,
                        sign_hiding=True)
    ps = ParamSets.from_config(cfg)
    ref = tuple(p.astype(np.int32) for p in (y, u, v))
    if cu == 16:
        gd, gy_, gu_, gv_ = encode_inter_frame(ps, (y2, u2, v2), ref, 32,
                                               cu_size=16)
    else:
        gd, gy_, gu_, gv_ = encode_inter_frame_tree(ps, (y2, u2, v2), ref,
                                                    32)
    dd, dy_, du_, dv_ = TpuInterEncoder(ps, cfg).encode_frame(
        (y2, u2, v2), (y, u, v))
    assert (gd.pred_mode == MODE_INTRA).any(), "no intra CU chosen"
    for f in ("pred_mode", "cu_depth", "mv", "coef_y", "coef_u", "coef_v",
              "luma_mode", "chroma_mode", "skip", "inter_mode", "merge_idx",
              "mvp_flag", "root_cbf"):
        assert np.array_equal(getattr(gd, f), getattr(dd, f)), f
    for name, g, d in (("y", gy_, dy_), ("u", gu_, du_), ("v", gv_, dv_)):
        assert np.array_equal(np.asarray(g, np.int32),
                              np.asarray(d, np.int32)), name


@pytest.mark.parametrize("cu", [16, 32])
def test_intra_in_p_e2e_conformance(tmp_path, cu, rng):
    """IPPP stream with intra-fallback CUs FFmpeg-decodes bit-exact
    (deblock on: exercises the BS2 luma strength + chroma deblock)."""
    from homerhevc_tpu.api import Encoder
    w, h = 128, 64
    f1, f2 = _occlusion_pair(rng, w, h)
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=1,
                        intra_period=0, sao=False, deblocking=True,
                        sign_hiding=True, cu_size=cu, intra_in_p=True,
                        reinit_gop_on_scene_change=False)
    enc = Encoder(cfg)
    path = tmp_path / "intra_p.265"
    efs = []
    with open(path, "wb") as f:
        for fr in (f1, f2, f2):
            for ef in enc.encode(*fr):
                f.write(ef.annex_b())
                efs.append(ef)
        for ef in enc.flush():
            f.write(ef.annex_b())
            efs.append(ef)
    assert [e.frame_type for e in efs] == ["I", "P", "P"]
    dec = decode_annexb(path)
    assert len(dec) == 3
    for i in range(3):
        d = np.abs(dec[i].astype(int)
                   - np.asarray(efs[i].recon["y"]).astype(int))
        assert d.max() == 0, f"frame {i}: maxdiff {d.max()}"
