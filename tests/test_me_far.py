"""FAR (4x-decimated) ME pyramid level: reach parity with the reference's
+-128x64 search window (hmr_private.h:76-77, diamond roam
hmr_motion_inter.c:1404). Golden accuracy, device twin bit-exactness, and
e2e conformance on high-motion content the +-32 two-level search misses."""

import numpy as np
import pytest

from homerhevc_tpu.config import EncoderConfig
from homerhevc_tpu.hevc import tables as T
from homerhevc_tpu.hevc.headers import ParamSets
from homerhevc_tpu.golden.inter_frame import far_grid, hier_pel_fields
from tests.conftest import decode_annexb, make_yuv


def test_far_grid_geometry():
    grid, mask = far_grid(16, 128)
    assert len(grid) == 65 * 33              # +-32 x +-16 at 4x = +-128x64
    assert mask.sum() < len(grid)            # interior is vote-masked
    # the 2x-covered interior never votes
    for (qx, qy), m in zip(grid, mask):
        if abs(4 * qx) <= 28 and abs(4 * qy) <= 28:
            assert not m


@pytest.mark.parametrize("pan", [(60, -12), (57, -10), (-100, 8)])
def test_golden_far_finds_large_pan(pan):
    """A pan far outside the 2x reach is recovered exactly on noise-like
    texture (the content class where decimation aliasing is worst)."""
    rng = np.random.RandomState(7)
    H, W = 128, 256
    base = (rng.rand(H + 64, W + 256) * 255).astype(np.int32)
    DX, DY = pan
    ref = base[32:32 + H, 128:128 + W].copy()
    src = base[32 + DY:32 + DY + H, 128 + DX:128 + DX + W].copy()
    lam16 = T.lambda_me_x16(32)
    mv16, _, _, _ = hier_pel_fields(src, ref, 16, lam16, want32=True,
                                    far=128)
    # valid region: blocks whose reference window stays inside the frame
    gx0 = max(0, -(DX // 16)) + 1
    gx1 = (W - max(0, DX)) // 16 - 1
    gy0 = max(0, -(DY // 16)) + 1
    gy1 = (H - max(0, DY)) // 16 - 1
    inner = mv16[gy0:gy1, gx0:gx1]
    frac = np.mean((inner[..., 0] == DX) & (inner[..., 1] == DY))
    assert frac > 0.8, f"far level missed pan {pan}: {frac:.2f} exact"


def test_device_far_matches_golden(rng):
    """me_range=64 FAR level: device == golden bit-exact (MVs, coefficients,
    reconstruction)."""
    from homerhevc_tpu.engine.inter_encoder import TpuInterEncoder
    from homerhevc_tpu.golden.inter_frame import encode_inter_frame

    w, h = 128, 64
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=1, intra_period=0,
                        sao=False, deblocking=False, sign_hiding=True,
                        cu_size=16, me_range=64)
    ps = ParamSets.from_config(cfg)
    y, u, v = make_yuv(rng, w, h)
    # 40-px pan: outside the +-32 two-level reach, inside me_range=64
    ry = np.roll(y.astype(np.int32), 40, axis=1)
    ru = np.roll(u.astype(np.int32), 20, axis=1)
    rv = np.roll(v.astype(np.int32), 20, axis=1)
    gd, gy, gu, gv = encode_inter_frame(ps, (y, u, v), (ry, ru, rv), cfg.qp,
                                        merge_rd="fast")
    assert (np.abs(gd.mv[:, :, 0]) > 32 * 4).any(), \
        "test content did not produce far MVs"
    enc = TpuInterEncoder(ps, cfg)
    dd, dy, du, dv = enc.encode_frame((y, u, v), (ry, ru, rv))
    assert np.array_equal(gd.mv, dd.mv), "MVs differ"
    assert np.array_equal(gd.coef_y, dd.coef_y)
    assert np.array_equal(gd.coef_u, dd.coef_u)
    assert np.array_equal(gd.coef_v, dd.coef_v)
    assert np.array_equal(gy, dy) and np.array_equal(gu, du) \
        and np.array_equal(gv, dv)


def test_me_far_e2e_conformance(tmp_path, rng):
    """IPPP with me_range=64 over a 40-px pan decodes bit-exact (FFmpeg
    oracle) and codes the pan cheaply (far MVs, small residual)."""
    from homerhevc_tpu.api import Encoder

    w, h = 128, 64
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=1, intra_period=0,
                        sao=False, deblocking=True, sign_hiding=True,
                        cu_size=16, me_range=64,
                        reinit_gop_on_scene_change=False)
    enc = Encoder(cfg)
    base = make_yuv(rng, w + 256, h)[0]
    us = np.full((h // 2, w // 2), 120, np.uint8)
    vs = np.full((h // 2, w // 2), 136, np.uint8)
    path = tmp_path / "far.265"
    recons = []
    with open(path, "wb") as f:
        for t in range(3):
            y = base[:, 40 * t:40 * t + w].copy()   # 40 px/frame pan
            for ef in enc.encode(y, us, vs):
                f.write(ef.annex_b())
                recons.append(ef.recon)
        for ef in enc.flush():
            f.write(ef.annex_b())
            recons.append(ef.recon)
    decoded = decode_annexb(path)
    assert len(decoded) == 3
    for i, dy in enumerate(decoded):
        assert np.array_equal(dy, recons[i]["y"]), f"frame {i}"
