"""P-frame end-to-end conformance: IPPP stream decodes in FFmpeg to exactly
our reconstructions."""

import numpy as np
import pytest

from homerhevc_tpu.config import EncoderConfig
from tests.conftest import decode_annexb, make_yuv


def _shifted(y, u, v, dx, dy, rng):
    """Shift content to create real motion + light noise."""
    y2 = np.roll(np.roll(y, dy, 0), dx, 1)
    u2 = np.roll(np.roll(u, dy // 2, 0), dx // 2, 1)
    v2 = np.roll(np.roll(v, dy // 2, 0), dx // 2, 1)
    y2 = np.clip(y2.astype(int) + rng.randint(-2, 3, y2.shape), 0, 255)
    return y2.astype(np.uint8), u2, v2


@pytest.mark.parametrize("deblock,sao", [(False, False), (True, False),
                                         (True, True)])
def test_e2e_ippp(tmp_path, rng, deblock, sao):
    from homerhevc_tpu.api import Encoder
    w, h = 128, 64
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=1, intra_period=0,
                        sao=sao, deblocking=deblock, sign_hiding=True,
                        cu_size=16)
    enc = Encoder(cfg)
    y, u, v = make_yuv(rng, w, h)
    frames = [(y, u, v)]
    for i in range(3):
        frames.append(_shifted(*frames[-1], dx=2 + i, dy=1, rng=rng))
    efs = []
    path = tmp_path / "ippp.265"
    with open(path, "wb") as f:
        for fr in frames:
            for ef in enc.encode(*fr):
                f.write(ef.annex_b())
                efs.append(ef)
        for ef in enc.flush():
            f.write(ef.annex_b())
            efs.append(ef)
    assert [e.frame_type for e in efs] == ["I", "P", "P", "P"]
    dec = decode_annexb(path)
    assert len(dec) == 4, f"decoded {len(dec)}/4"
    for i, dy_ in enumerate(dec):
        d = np.abs(dy_.astype(int) - efs[i].recon["y"].astype(int))
        assert d.max() == 0, f"frame {i} ({efs[i].frame_type}): maxdiff {d.max()}"


def test_inter_syntax_modes(tmp_path, rng):
    """Static scene -> P frames should be mostly skip; still exact."""
    from homerhevc_tpu.api import Encoder
    w, h = 64, 64
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=1, intra_period=0,
                        sao=False, deblocking=False, sign_hiding=False,
                        cu_size=16)
    enc = Encoder(cfg)
    y, u, v = make_yuv(rng, w, h)
    efs = []
    path = tmp_path / "skip.265"
    with open(path, "wb") as f:
        for _ in range(3):
            for ef in enc.encode(y, u, v):
                f.write(ef.annex_b())
                efs.append(ef)
        for ef in enc.flush():
            f.write(ef.annex_b())
            efs.append(ef)
    dec = decode_annexb(path)
    assert len(dec) == 3
    for i in range(3):
        assert np.array_equal(dec[i], efs[i].recon["y"]), f"frame {i}"
    # P frames of a static scene should be tiny (mostly skip)
    assert efs[1].bits < efs[0].bits / 4


def test_select_syntax_vec_matches_loop(rng):
    """The vectorized cu==ctu syntax selection must equal the per-CU loop."""
    from homerhevc_tpu.config import EncoderConfig
    from homerhevc_tpu.hevc.headers import ParamSets
    from homerhevc_tpu.hevc.syntax import FrameDesc, MODE_INTER
    from homerhevc_tpu.golden.inter_frame import (
        _select_inter_syntax_loop, _select_inter_syntax_vec)

    w, h = 160, 96
    cfg = EncoderConfig(width=w, height=h, qp=30, cu_size=16, sao=False,
                        deblocking=False, sign_hiding=False)
    ps = ParamSets.from_config(cfg)
    for trial in range(6):
        is_b = trial % 2 == 1
        d1 = FrameDesc.alloc(w, h)
        d1.pred_mode[:] = MODE_INTER
        # coherent-ish field with repeats so merges/skips happen
        base = rng.randint(-3, 4, (h // 16, w // 16, 2)) * 4
        keep = rng.rand(h // 16, w // 16) < 0.7
        for gy in range(h // 16):
            for gx in range(w // 16):
                if keep[gy, gx] and gx > 0:
                    base[gy, gx] = base[gy, gx - 1]
        d1.mv[:] = np.repeat(np.repeat(base, 2, 0), 2, 1)
        # sparse residuals
        mask = rng.rand(h // 16, w // 16) < 0.5
        for gy in range(h // 16):
            for gx in range(w // 16):
                if mask[gy, gx]:
                    d1.coef_y[gy * 16 + 3, gx * 16 + 2] = 5
        import copy
        d2 = copy.deepcopy(d1)
        _select_inter_syntax_loop(ps, d1, 16, is_b=is_b)
        _select_inter_syntax_vec(ps, d2, 16, is_b)
        for f in ("skip", "inter_mode", "merge_idx", "root_cbf", "mvp_flag"):
            assert np.array_equal(getattr(d1, f), getattr(d2, f)), (f, trial)


def test_ippp_rd_regression_guard(rng):
    """Pin the IPPP operating point on a small multi-layer-motion clip.
    Catches ME/RD regressions that bit-exactness tests cannot (e.g. a
    coarse-search change that locks onto the wrong motion layer): the
    encoder must stay near its known rate at known quality."""
    from homerhevc_tpu.api import Encoder
    from homerhevc_tpu.config import EncoderConfig
    from homerhevc_tpu.utils.metrics import psnr

    w, h = 128, 96
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    tex = (rng.rand(h, w) * 40).astype(np.float32)
    frames = []
    for t in range(6):
        y = np.clip(80 + 30 * np.sin(xx / 23.0 + t * 0.3)
                    + np.roll(tex, t * 3, axis=1), 0, 255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 90, np.uint8)
        frames.append((y, u, u.copy()))
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=1, intra_period=0,
                        sao=False, deblocking=True, sign_hiding=True,
                        cu_size=32, reinit_gop_on_scene_change=False)
    enc = Encoder(cfg)
    bits = 0
    ys = []
    for f in frames:
        for ef in enc.encode(*f):
            bits += ef.bits
            ys.append(psnr(frames[ef.poc][0], ef.recon["y"]))
    for ef in enc.flush():
        bits += ef.bits
        ys.append(psnr(frames[ef.poc][0], ef.recon["y"]))
    p_bits = bits  # I + 5 P
    avg_p_psnr = float(np.mean(ys[1:]))
    # measured at the round-3 operating point: ~27-33k bits total (rng-
    # order dependent), ~31 dB. The round-2 guard allowed 2x rate/-2 dB —
    # loose enough to hide a real ME regression; tightened to ~1.4x/-1 dB.
    assert p_bits < 45_000, p_bits
    assert avg_p_psnr > 30.0, avg_p_psnr


def test_ippp_partial_ctb_bands(tmp_path, rng):
    """Dims not multiples of 16 (the 1080p bottom-band case): the boundary
    band is coded as zero-MV CU8s and every frame must decode bit-exact."""
    from homerhevc_tpu.api import Encoder
    from homerhevc_tpu.config import EncoderConfig
    from tests.conftest import decode_annexb, make_yuv

    w, h = 88, 72
    y, u, v = make_yuv(rng, w, h)
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=1, intra_period=0,
                        sao=False, deblocking=False, sign_hiding=True,
                        cu_size=16, reinit_gop_on_scene_change=False)
    enc = Encoder(cfg)
    path = tmp_path / "band.265"
    efs = []
    with open(path, "wb") as f:
        for i in range(3):
            y2 = np.clip(np.roll(y, i * 3, 1).astype(int)
                         + rng.randint(-2, 3, y.shape), 0, 255) \
                .astype(np.uint8)
            for ef in enc.encode(y2, u, v):
                f.write(ef.annex_b())
                efs.append(ef)
        for ef in enc.flush():
            f.write(ef.annex_b())
            efs.append(ef)
    dec = decode_annexb(path)
    assert len(dec) == 3
    for i in range(3):
        assert np.array_equal(dec[i], efs[i].recon["y"]), i


def test_gpb_conformance(tmp_path, rng):
    """Generalized-B "P" frames (cfg.gpb): once two references exist, each
    frame is a B slice bi-predicting from t-1 (L0) and t-2 (L1 via
    ref_pic_list_modification). FFmpeg must accept the header syntax and
    reproduce the encoder's reconstruction bit-exactly."""
    from homerhevc_tpu.api import Encoder
    from homerhevc_tpu.config import EncoderConfig
    from tests.conftest import decode_annexb, make_yuv

    w, h = 96, 64
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=1, intra_period=0,
                        sao=False, deblocking=True, sign_hiding=True,
                        cu_size=32, reinit_gop_on_scene_change=False,
                        gpb=True)
    enc = Encoder(cfg)
    y0, u0, v0 = make_yuv(rng, w, h)
    efs = []
    path = tmp_path / "gpb.265"
    with open(path, "wb") as f:
        for t in range(6):
            y = np.clip(np.roll(y0, 2 * t, 1).astype(np.int32)
                        + rng.randint(-3, 4, (h, w)), 0, 255).astype(np.uint8)
            for ef in enc.encode(y, u0, v0):
                f.write(ef.annex_b())
                efs.append(ef)
        for ef in enc.flush():
            f.write(ef.annex_b())
            efs.append(ef)
    types = [e.frame_type for e in efs]
    # I, first P (one ref), then generalized-B frames
    assert types[0] == "I" and types[1] == "P", types
    assert all(t == "B" for t in types[2:]), types
    dec = decode_annexb(path)
    assert len(dec) == 6
    for i in range(6):
        assert np.array_equal(dec[i], np.asarray(efs[i].recon["y"])), \
            f"frame {i}"


def test_select_syntax_tree_vec_matches_walk():
    """The vectorized tree syntax selection must equal the recursive walk
    bit-for-bit on mixed-depth motion fields (skip/merge/AMVP indices,
    z-scan B0/A0 availability, zero-MV fill, intra holes)."""
    import numpy as np
    from homerhevc_tpu.config import EncoderConfig
    from homerhevc_tpu.golden.inter_frame import (
        _select_inter_syntax_tree_vec, select_inter_syntax_tree)
    from homerhevc_tpu.hevc.headers import ParamSets
    from homerhevc_tpu.hevc.syntax import FrameDesc, MODE_INTER, MODE_INTRA

    for ctu in (32, 64):
        for seed in range(6):
            rng = np.random.RandomState(100 + seed)
            w, h = 4 * ctu, 2 * ctu
            cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=1,
                                cu_size=ctu, sao=False, deblocking=False)
            ps = ParamSets.from_config(cfg)

            def build():
                d = FrameDesc.alloc(w, h)
                d.pred_mode[:] = MODE_INTER
                base = ps.log2_ctu - 4          # CU16 depth
                d.cu_depth[:] = base
                # random CU32 regions
                ch32 = rng.rand(h // 32, w // 32) < 0.4
                m32 = np.repeat(np.repeat(ch32, 4, 0), 4, 1)
                d.cu_depth[m32] = base - 1
                if ctu == 64:
                    ch64 = rng.rand(h // 64, w // 64) < 0.3
                    m64 = np.repeat(np.repeat(ch64, 8, 0), 8, 1)
                    d.cu_depth[m64] = 0
                # small-range MVs with many duplicates (exercises pruning)
                # and zero MVs (exercises zero-fill merge)
                mv16 = rng.randint(-2, 3, (h // 16, w // 16, 2)) * 4
                d.mv[:] = np.repeat(np.repeat(mv16, 2, 0), 2, 1)
                # motion uniform within each adopted CU (as encoders emit)
                for n in (64, 32):
                    if n > ctu:
                        continue
                    r8 = n // 8
                    dep = ps.log2_ctu - (n.bit_length() - 1)
                    for gy in range(h // n):
                        for gx in range(w // n):
                            if d.cu_depth[gy * r8, gx * r8] == dep:
                                d.mv[gy*r8:(gy+1)*r8, gx*r8:(gx+1)*r8] = \
                                    d.mv[gy * r8, gx * r8]
                # intra holes (CU16 cells)
                ih = rng.rand(h // 16, w // 16) < 0.15
                ih &= np.repeat(np.repeat(
                    d.cu_depth[::2, ::2] == base, 1, 0), 1, 1)[:h//16, :w//16]
                m8i = np.repeat(np.repeat(ih, 2, 0), 2, 1)
                d.pred_mode[m8i] = MODE_INTRA
                # sparse residuals
                d.coef_y = (rng.rand(h, w) < 0.002).astype(np.int16)
                d.coef_u = np.zeros((h // 2, w // 2), np.int16)
                d.coef_v = (rng.rand(h // 2, w // 2) < 0.002) \
                    .astype(np.int16)
                return d

            d1 = build()
            d2 = FrameDesc.alloc(w, h)
            for f in ("pred_mode", "cu_depth", "mv", "coef_y", "coef_u",
                      "coef_v"):
                setattr(d2, f, getattr(d1, f).copy())
            _select_inter_syntax_tree_vec(ps, d1)
            # force the walk on the twin
            ctu_old = d2.inter_part
            select = select_inter_syntax_tree
            # walk path: call the internal loop by disabling the vec gate
            d2.ref_idx = None
            from homerhevc_tpu.golden import inter_frame as IF

            def walk_only(ps_, desc_):
                ctu_ = ps_.ctu_size

                def walk(x0, y0, n, depth):
                    if x0 >= desc_.width or y0 >= desc_.height:
                        return
                    inside = (x0 + n <= desc_.width
                              and y0 + n <= desc_.height)
                    if inside and int(desc_.cu_depth[y0 // 8,
                                                     x0 // 8]) <= depth:
                        IF._select_cu_syntax(ps_, desc_, x0, y0, n, False)
                        return
                    half = n // 2
                    for (dy, dx) in ((0, 0), (0, half), (half, 0),
                                     (half, half)):
                        walk(x0 + dx, y0 + dy, half, depth + 1)
                for cy in range(-(-desc_.height // ctu_)):
                    for cx in range(-(-desc_.width // ctu_)):
                        walk(cx * ctu_, cy * ctu_, ctu_, 0)
            walk_only(ps, d2)
            for f in ("skip", "inter_mode", "merge_idx", "root_cbf",
                      "mvp_flag"):
                a, b = getattr(d1, f), getattr(d2, f)
                assert np.array_equal(a, b), \
                    f"ctu={ctu} seed={seed} field={f}: " \
                    f"{np.argwhere(a != b)[:5]}"
