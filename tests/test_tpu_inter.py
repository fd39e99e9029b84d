"""Device P-frame encoder must match the golden inter encoder bit-exactly."""

import numpy as np
import pytest

from homerhevc_tpu.config import EncoderConfig
from homerhevc_tpu.engine.inter_encoder import TpuInterEncoder
from homerhevc_tpu.golden.inter_frame import encode_inter_frame
from homerhevc_tpu.hevc.headers import ParamSets
from tests.conftest import make_yuv


@pytest.mark.parametrize("sbh", [False, True])
def test_device_inter_matches_golden(sbh, rng):
    w, h = 128, 64
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=1, intra_period=0,
                        sao=False, deblocking=False, sign_hiding=sbh,
                        cu_size=16)
    ps = ParamSets.from_config(cfg)
    y, u, v = make_yuv(rng, w, h)
    # reference picture: shifted + noisy copy (odd shift to exercise the
    # half-pel chroma interpolation path)
    ry = np.roll(y, 3, axis=1).astype(np.int32)
    ru = np.roll(u, 1, axis=1).astype(np.int32)
    rv = np.roll(v, 1, axis=1).astype(np.int32)
    # the device CU16 program includes the batched merge-RD stage;
    # merge_rd="fast" selects its golden twin (merge_rd_fast)
    gd, gy, gu, gv = encode_inter_frame(ps, (y, u, v), (ry, ru, rv), cfg.qp,
                                        merge_rd="fast")
    enc = TpuInterEncoder(ps, cfg)
    dd, dy, du, dv = enc.encode_frame((y, u, v), (ry, ru, rv))
    assert np.array_equal(gd.mv, dd.mv), "MVs differ"
    assert np.array_equal(gd.coef_y, dd.coef_y)
    assert np.array_equal(gd.coef_u, dd.coef_u)
    assert np.array_equal(gd.coef_v, dd.coef_v)
    assert np.array_equal(gy, dy) and np.array_equal(gu, du) \
        and np.array_equal(gv, dv)
    assert np.array_equal(gd.skip, dd.skip)
    assert np.array_equal(gd.inter_mode, dd.inter_mode)
    assert np.array_equal(gd.merge_idx, dd.merge_idx)
    assert np.array_equal(gd.mvp_flag, dd.mvp_flag)


def test_device_tree_matches_golden(rng):
    """CTB32 two-level CU tree: device == golden bit-exact."""
    from homerhevc_tpu.config import EncoderConfig
    from homerhevc_tpu.hevc.headers import ParamSets
    from homerhevc_tpu.golden.inter_frame import encode_inter_frame_tree
    from homerhevc_tpu.engine.inter_encoder import TpuInterEncoder

    w, h = 128, 80
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y0 = (128 + 60 * np.sin(xx / 19.0) + 40 * np.cos(yy / 13.0)
          + rng.randint(-6, 7, (h, w))).astype(np.uint8)
    u0 = (100 + 30 * np.sin(xx[:h // 2, :w // 2] / 11.0)).astype(np.uint8)
    v0 = u0[::-1].copy()
    y1 = np.clip(np.roll(y0, 5, 1).astype(int) + rng.randint(-2, 3, y0.shape),
                 0, 255).astype(np.uint8)
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=1, intra_period=0,
                        sao=False, deblocking=False, sign_hiding=True,
                        cu_size=32, reinit_gop_on_scene_change=False)
    ps = ParamSets.from_config(cfg)
    gd, gy_, gu_, gv_ = encode_inter_frame_tree(
        ps, (y1, u0, v0),
        tuple(p.astype(np.int32) for p in (y0, u0, v0)), 30)
    dd, dy_, du_, dv_ = TpuInterEncoder(ps, cfg).encode_frame(
        (y1, u0, v0), (y0, u0, v0))
    assert np.array_equal(gd.cu_depth, dd.cu_depth)
    assert (gd.cu_depth == 0).any(), "no CU32 chosen - test content too hard"
    assert np.array_equal(gd.mv, dd.mv)
    assert np.array_equal(gd.coef_y, dd.coef_y)
    assert np.array_equal(gy_, dy_) and np.array_equal(gu_, du_) \
        and np.array_equal(gv_, dv_)
    for f in ("skip", "inter_mode", "merge_idx", "root_cbf", "mvp_flag"):
        assert np.array_equal(getattr(gd, f), getattr(dd, f)), f


def test_ctb32_tree_e2e_conformance(tmp_path, rng):
    """IPPP at CTB32 with the CU-tree device path decodes bit-exact."""
    from homerhevc_tpu.api import Encoder
    from homerhevc_tpu.config import EncoderConfig
    from tests.conftest import decode_annexb, make_yuv

    w, h = 128, 80
    y, u, v = make_yuv(rng, w, h)
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=1, intra_period=0,
                        sao=False, deblocking=True, sign_hiding=True,
                        cu_size=32, reinit_gop_on_scene_change=False)
    enc = Encoder(cfg)
    path = tmp_path / "tree.265"
    efs = []
    with open(path, "wb") as f:
        for i in range(4):
            y2 = np.clip(np.roll(y, i * 4, 1).astype(int)
                         + rng.randint(-2, 3, y.shape), 0, 255) \
                .astype(np.uint8)
            for ef in enc.encode(y2, u, v):
                f.write(ef.annex_b())
                efs.append(ef)
        for ef in enc.flush():
            f.write(ef.annex_b())
            efs.append(ef)
    dec = decode_annexb(path)
    assert len(dec) == 4
    for i in range(4):
        assert np.array_equal(dec[i], efs[i].recon["y"]), i


def test_device_b_matches_golden(rng):
    """Bi-predicted device program (_impl_b) must match the golden
    encode_b_frame_tree bit-exactly (MVs both lists, levels, recon)."""
    from homerhevc_tpu.engine.inter_encoder import TpuInterEncoder
    from homerhevc_tpu.golden.inter_frame import encode_b_frame_tree
    from homerhevc_tpu.hevc.headers import ParamSets
    from homerhevc_tpu.config import EncoderConfig

    w, h = 128, 96
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=2, intra_period=0,
                        sao=False, deblocking=True, sign_hiding=True,
                        cu_size=32)
    ps = ParamSets.from_config(cfg)
    y, u, v = make_yuv(rng, w, h)
    r0 = (np.roll(y, 3, 1).astype(np.int32), np.roll(u, 1, 1).astype(np.int32),
          np.roll(v, 1, 1).astype(np.int32))
    r1 = (np.roll(y, -3, 1).astype(np.int32),
          np.roll(u, -1, 1).astype(np.int32),
          np.roll(v, -1, 1).astype(np.int32))
    gd, gy, gu, gv = encode_b_frame_tree(ps, (y, u, v), r0, r1, cfg.qp)
    enc = TpuInterEncoder(ps, cfg, search=16)
    dd, dy, du, dv = enc.encode_frame_b((y, u, v), r0, r1)
    assert np.array_equal(gd.mv, dd.mv), "L0 MVs differ"
    assert np.array_equal(gd.mv_l1, dd.mv_l1), "L1 MVs differ"
    assert np.array_equal(gd.cu_depth, dd.cu_depth), "tree differs"
    assert np.array_equal(gd.coef_y, dd.coef_y)
    assert np.array_equal(gd.coef_u, dd.coef_u)
    assert np.array_equal(gd.coef_v, dd.coef_v)
    assert np.array_equal(np.asarray(gy, np.uint8), np.asarray(dy))
    assert np.array_equal(np.asarray(gu, np.uint8), np.asarray(du))
    assert np.array_equal(np.asarray(gv, np.uint8), np.asarray(dv))
    assert np.array_equal(gd.inter_mode, dd.inter_mode)
    assert np.array_equal(gd.merge_idx, dd.merge_idx)
