"""RD-checked merge (reference check_rd_cost_merge_2nx2n,
hmr_motion_inter.c:3493): merge candidates are evaluated as prediction
alternatives with recon cost, not just recognized post-hoc."""

import numpy as np

from homerhevc_tpu.api import Encoder
from homerhevc_tpu.config import EncoderConfig
from homerhevc_tpu.hevc.headers import ParamSets
from tests.conftest import decode_annexb, make_yuv


def test_merge_rd_flips_and_stays_conformant(tmp_path):
    """On sub-pel global motion ME lands on scattered MVs; the merge pass
    must flip some CUs to a neighbour's MV, and the stream must stay
    FFmpeg-bit-exact."""
    from homerhevc_tpu.engine.pipeline import EncoderPipeline
    from homerhevc_tpu.golden.inter_frame import (encode_inter_frame_tree,
                                                  merge_rd_p, zf_multiplier)
    rng = np.random.RandomState(21)
    w, h = 96, 64
    cfg = EncoderConfig(width=w, height=h, qp=35, gop_size=1, cu_size=32,
                        sao=False, deblocking=False, sign_hiding=False,
                        intra_period=0)
    pipe = EncoderPipeline(cfg, backend="golden")
    y, u, v = make_yuv(rng, w, h)
    # reference = source + mild noise: ME costs differ slightly per CU,
    # so neighbouring CUs pick slightly different MVs
    ry = np.clip(y.astype(np.int32)
                 + rng.randint(-6, 7, y.shape), 0, 255)
    ru = np.clip(u.astype(np.int32) + rng.randint(-3, 4, u.shape), 0, 255)
    rv = np.clip(v.astype(np.int32) + rng.randint(-3, 4, v.shape), 0, 255)
    d_on, *_ = encode_inter_frame_tree(pipe.ps, (y, u, v), (ry, ru, rv),
                                       35, search=8, merge_rd=True)
    d_off, *_ = encode_inter_frame_tree(pipe.ps, (y, u, v), (ry, ru, rv),
                                        35, search=8, merge_rd=False)
    # the pass must actually do something on this content
    assert not np.array_equal(d_on.mv, d_off.mv)
    # flipped MVs appear as merge/skip in the final syntax more often
    assert (d_on.inter_mode <= 1).sum() >= (d_off.inter_mode <= 1).sum()


def test_merge_rd_e2e_ippp(tmp_path):
    rng = np.random.RandomState(8)
    w, h = 96, 64
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=1, cu_size=32,
                        sao=False, deblocking=True, sign_hiding=True,
                        intra_period=0)
    from homerhevc_tpu.engine.pipeline import EncoderPipeline
    enc = Encoder(cfg)
    enc._pipeline = EncoderPipeline(cfg, backend="golden")
    path = tmp_path / "mrd.265"
    base = make_yuv(rng, w, h)
    recons = []
    with open(path, "wb") as f:
        for t in range(3):
            y = np.roll(base[0], t, axis=0)
            u = np.roll(base[1], t, axis=0)
            v = np.roll(base[2], t, axis=0)
            for ef in enc.encode(y, u, v):
                f.write(ef.annex_b())
                recons.append(ef.recon)
        for ef in enc.flush():
            f.write(ef.annex_b())
            recons.append(ef.recon)
    decoded = decode_annexb(path)
    assert len(decoded) == len(recons) == 3
    for i, dy in enumerate(decoded):
        assert np.array_equal(dy, recons[i]["y"]), f"frame {i} mismatch"


def test_merge_rd_fast_device_twin_with_flips(rng):
    """Batched merge-RD (device program stage) == golden merge_rd_fast,
    on content that actually provokes flips (per-frame noise makes per-CU
    ME lock onto noise minima a neighbour's MV beats)."""
    from homerhevc_tpu.engine.inter_encoder import TpuInterEncoder
    from homerhevc_tpu.golden.inter_frame import encode_inter_frame

    w, h = 128, 64
    r2 = np.random.RandomState(1)
    cfg = EncoderConfig(width=w, height=h, qp=35, gop_size=1,
                        intra_period=0, sao=False, deblocking=False,
                        sign_hiding=True, cu_size=16)
    ps = ParamSets.from_config(cfg)
    y, u, v = make_yuv(r2, w, h)
    ry = np.roll(y, 3, axis=1).astype(np.int32)
    ru = np.roll(u, 1, axis=1).astype(np.int32)
    rv = np.roll(v, 1, axis=1).astype(np.int32)
    y2 = np.clip(y.astype(int) + r2.randint(-12, 13, y.shape),
                 0, 255).astype(np.uint8)
    base, *_ = encode_inter_frame(ps, (y2, u, v), (ry, ru, rv), 35)
    gd, gy, gu, gv = encode_inter_frame(ps, (y2, u, v), (ry, ru, rv), 35,
                                        merge_rd="fast")
    assert (base.mv != gd.mv).any(), "content provoked no flips - vacuous"
    dd, dy, du, dv = TpuInterEncoder(ps, cfg).encode_frame(
        (y2, u, v), (ry, ru, rv), qp=35)
    dd.densify()
    assert np.array_equal(gd.mv, dd.mv)
    assert np.array_equal(gd.coef_y, dd.coef_y)
    assert np.array_equal(gd.coef_u, dd.coef_u)
    assert np.array_equal(gd.coef_v, dd.coef_v)
    assert np.array_equal(np.asarray(gy), np.asarray(dy))
    assert np.array_equal(np.asarray(gu), np.asarray(du))
    assert np.array_equal(np.asarray(gv), np.asarray(dv))
    for f in ("skip", "inter_mode", "merge_idx", "mvp_flag"):
        assert np.array_equal(getattr(gd, f), getattr(dd, f)), f


def test_merge_rd_fast_e2e_device_pipeline(tmp_path):
    """IPPP on the device CU16 path with the in-program merge-RD stage:
    noisy-content streams decode bit-exact through FFmpeg."""
    from homerhevc_tpu.engine.pipeline import EncoderPipeline
    r2 = np.random.RandomState(4)
    w, h, n = 128, 64, 4
    cfg = EncoderConfig(width=w, height=h, qp=34, gop_size=1,
                        intra_period=0, sao=False, deblocking=True,
                        sign_hiding=True, cu_size=16,
                        reinit_gop_on_scene_change=False)
    pipe = EncoderPipeline(cfg)
    y, u, v = make_yuv(r2, w, h)
    recons = []
    path = tmp_path / "mrd_dev.265"
    with open(path, "wb") as f:
        for t in range(n):
            y2 = np.clip(np.roll(y, 2 * t, axis=1).astype(int)
                         + r2.randint(-10, 11, y.shape),
                         0, 255).astype(np.uint8)
            for ef in pipe.push(y2, u, v):
                f.write(ef.annex_b())
                recons.append(ef.recon)
        for ef in pipe.flush():
            f.write(ef.annex_b())
            recons.append(ef.recon)
    decoded = decode_annexb(path)
    assert len(decoded) == n
    for i, d in enumerate(decoded):
        assert np.array_equal(d, recons[i]["y"]), f"frame {i}"
