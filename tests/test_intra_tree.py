"""Intra CU-tree RDO (golden two-pass): decision sanity, conformance of
the closed-loop tree encode, rate benefit vs uniform CUs, and the
coefficient-rate model's calibration against the real CABAC bit counter
(reference analog: FAST_BIT_EST, hmr_binary_encoding.c:280-351)."""

import numpy as np

from homerhevc_tpu.api import Encoder
from homerhevc_tpu.config import EncoderConfig
from homerhevc_tpu.hevc.headers import ParamSets
from tests.conftest import decode_annexb, make_yuv


def _mixed_frame(rng, w, h):
    """Left half flat (wants CU32: zero residual, minimum overhead), right
    half stripes whose orientation flips per 8x8 cell (each cell is well
    predicted by a DIFFERENT angular mode, so one 32-wide mode can't fit
    and the tree must split)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    y = np.full((h, w), 90, np.float32)
    # concentric rings: locally straight edges (a per-8x8 angular mode
    # tracks them), globally curved (no single 32-wide mode can)
    r = np.sqrt((xx - w * 0.75) ** 2 + (yy - h * 0.5) ** 2)
    rings = 60 + 60 * np.sin(r * 0.8)
    y[:, w // 2:] = rings[:, w // 2:]
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 130, np.uint8)
    return np.clip(y, 0, 255).astype(np.uint8), u, v


def test_tree_decision_mixed_depths(rng):
    w, h = 96, 64
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=0, cu_size=32,
                        sao=False, deblocking=False)
    ps = ParamSets.from_config(cfg)
    y, u, v = _mixed_frame(rng, w, h)
    from homerhevc_tpu.golden.intra_tree import decide_intra_tree
    dec = decide_intra_tree(ps, y, u, v, 32, ctb=32)
    smooth = dec.depth8[:, : w // 2 // 8]
    busy = dec.depth8[:, w // 2 // 8:]
    # smooth side should keep large CUs; busy side should split deeper
    assert smooth.mean() < busy.mean(), (smooth.mean(), busy.mean())
    assert (smooth == 0).any(), "no CU32 chosen on the smooth half"


def _encode_bits(cfg, frames):
    enc = Encoder(cfg)
    bits = 0
    nals = b""
    recons = []
    for f in frames:
        for ef in enc.encode(*f):
            bits += ef.bits
            nals += ef.annex_b()
            recons.append(ef.recon)
    for ef in enc.flush():
        bits += ef.bits
        nals += ef.annex_b()
        recons.append(ef.recon)
    return bits, nals, recons


def test_tree_conformance_and_rate(rng, tmp_path):
    w, h = 96, 64
    y, u, v = _mixed_frame(rng, w, h)
    common = dict(width=w, height=h, qp=32, gop_size=0, sao=False,
                  deblocking=False, sign_hiding=True)
    bits_tree, nals, recons = _encode_bits(
        EncoderConfig(cu_size=32, intra_rdo=True, **common), [(y, u, v)])
    path = tmp_path / "tree.265"
    path.write_bytes(nals)
    decoded = decode_annexb(path)
    assert len(decoded) == 1
    assert np.array_equal(decoded[0], recons[0]["y"]), \
        "tree stream must decode bit-exact to encoder recon"
    bits_u16, _, _ = _encode_bits(
        EncoderConfig(cu_size=16, **common), [(y, u, v)])
    bits_u32, _, _ = _encode_bits(
        EncoderConfig(cu_size=32, **common), [(y, u, v)])
    # the adaptive tree should beat both uniform settings (small slack for
    # the open-loop estimate)
    assert bits_tree <= 1.02 * min(bits_u16, bits_u32), \
        (bits_tree, bits_u16, bits_u32)


def test_tree_conformance_textured(rng, tmp_path):
    w, h = 64, 64
    y, u, v = make_yuv(rng, w, h)
    cfg = EncoderConfig(width=w, height=h, qp=27, gop_size=0, cu_size=32,
                        intra_rdo=True, sao=False, deblocking=False,
                        sign_hiding=True)
    bits, nals, recons = _encode_bits(cfg, [(y, u, v)])
    path = tmp_path / "tree2.265"
    path.write_bytes(nals)
    decoded = decode_annexb(path)
    assert np.array_equal(decoded[0], recons[0]["y"])


def test_coef_bits_model_vs_cabac_counter(rng):
    """The fast coefficient-rate model A*nnz + B*sum + C used by the tree
    RDO must track the real CABAC fractional-bit counter (CabacCounter)
    across TU sizes and QPs: rank correlation > 0.9."""
    from homerhevc_tpu.golden.intra_tree import _coef_cost_bits
    from homerhevc_tpu.golden.quantize import quantize
    from homerhevc_tpu.golden.transform import forward_transform
    from homerhevc_tpu.hevc.cabac import CabacCounter
    from homerhevc_tpu.hevc.syntax import SliceDataEncoder, FrameDesc
    from homerhevc_tpu.hevc.ctx_tables import init_contexts

    cfg = EncoderConfig(width=64, height=64, qp=32, gop_size=0, cu_size=32)
    ps = ParamSets.from_config(cfg)
    desc = FrameDesc.alloc(64, 64)
    est, real = [], []
    for size in (4, 8, 16, 32):
        for qp in (27, 32, 37):
            for amp in (8, 30, 90):
                blk = (rng.rand(size, size) * 2 - 1) * amp
                lvl = quantize(forward_transform(blk.astype(np.int32),
                                                 False), qp, True, False)
                if not np.any(lvl):
                    continue
                ctr = CabacCounter(init_contexts("I", qp))
                sd = SliceDataEncoder(ps, desc, ctr, 2, qp)
                sd._residual_coding(lvl, size.bit_length() - 1, 0, 0)
                est.append(_coef_cost_bits(lvl))
                real.append(ctr.bits())
    est, real = np.asarray(est), np.asarray(real)
    assert len(est) >= 20
    r = np.corrcoef(est, real)[0, 1]
    assert r > 0.9, f"coef-bit model decorrelated from CABAC counter: r={r}"


def _tree_cfg(w, h, qp=32, **kw):
    return EncoderConfig(width=w, height=h, qp=qp, gop_size=0, cu_size=32,
                         sao=False, deblocking=False, sign_hiding=True,
                         intra_rdo=True, **kw)


def test_device_decision_matches_golden(rng):
    w, h = 96, 64
    cfg = _tree_cfg(w, h)
    ps = ParamSets.from_config(cfg)
    y, u, v = _mixed_frame(rng, w, h)
    from homerhevc_tpu.golden.intra_tree import decide_intra_tree
    from homerhevc_tpu.engine.intra_tree_encoder import TpuIntraTreeEncoder
    gold = decide_intra_tree(ps, y, u, v, cfg.qp, ctb=32)
    enc = TpuIntraTreeEncoder(ps, cfg)
    dev = enc.decide(y, u, v, cfg.qp)
    assert np.array_equal(dev.depth8, gold.depth8), \
        (dev.depth8, gold.depth8)
    assert np.array_equal(dev.mode8, gold.mode8)


def test_device_tree_encode_matches_golden(rng):
    """Device CTB32 wavefront encode (21-node hypothesis set) must be
    bit-exact to the golden closed-loop tree encode: recon + coefficient
    planes + maps."""
    w, h = 96, 64
    for qp, seed in ((32, 0), (27, 1)):
        r2 = np.random.RandomState(seed)
        cfg = _tree_cfg(w, h, qp=qp)
        ps = ParamSets.from_config(cfg)
        y, u, v = (_mixed_frame(r2, w, h) if seed == 0
                   else make_yuv(r2, w, h))
        from homerhevc_tpu.golden.intra_tree import (decide_intra_tree,
                                                     encode_intra_tree_frame)
        from homerhevc_tpu.engine.intra_tree_encoder import \
            TpuIntraTreeEncoder
        gdec = decide_intra_tree(ps, y, u, v, qp, ctb=32)
        gdesc, gy_, gu_, gv_ = encode_intra_tree_frame(ps, y, u, v, qp, gdec,
                                                       ctb=32)
        enc = TpuIntraTreeEncoder(ps, cfg)
        desc, ry, ru, rv = enc.encode_frame(y, u, v, qp)
        assert np.array_equal(desc.cu_depth, gdesc.cu_depth)
        assert np.array_equal(desc.luma_mode, gdesc.luma_mode)
        assert np.array_equal(np.asarray(ry), gy_.astype(np.uint8)), qp
        assert np.array_equal(np.asarray(ru), gu_.astype(np.uint8))
        assert np.array_equal(np.asarray(rv), gv_.astype(np.uint8))
        desc.densify()   # device descs carry the CG wire
        assert np.array_equal(desc.coef_y, gdesc.coef_y)
        assert np.array_equal(desc.coef_u, gdesc.coef_u)
        assert np.array_equal(desc.coef_v, gdesc.coef_v)


def test_device_tree_deblock_matches_golden(rng):
    """Tree device path with deblocking ON: in-loop BS-map deblock must be
    bit-exact to the golden intra_bs_maps + deblock_plane_* chain the
    pipeline's golden backend applies."""
    from homerhevc_tpu.engine.intra_tree_encoder import TpuIntraTreeEncoder
    from homerhevc_tpu.golden import deblock as gdb
    from homerhevc_tpu.golden.intra_tree import (decide_intra_tree,
                                                 encode_intra_tree_frame)

    import dataclasses
    w, h = 96, 64
    qp = 30
    cfg = dataclasses.replace(_tree_cfg(w, h, qp=qp), deblocking=True)
    ps = ParamSets.from_config(cfg)
    y, u, v = _mixed_frame(rng, w, h)
    gdec = decide_intra_tree(ps, y, u, v, qp, ctb=32)
    gdesc, gy_, gu_, gv_ = encode_intra_tree_frame(ps, y, u, v, qp, gdec,
                                                   ctb=32)
    cu_sz = (ps.ctu_size >> gdesc.cu_depth).astype(np.int32)
    tu8 = (cu_sz >> gdesc.tr_depth).astype(np.int32)
    qp8 = np.full_like(tu8, qp)
    bs_v, bs_h = gdb.intra_bs_maps(tu8)
    gy2 = gdb.deblock_plane_luma(gy_, tu8, qp8, bs_v, bs_h)
    gu2 = gdb.deblock_plane_chroma(gu_, qp8, bs_v, bs_h, ps.cb_qp_offset)
    gv2 = gdb.deblock_plane_chroma(gv_, qp8, bs_v, bs_h, ps.cr_qp_offset)
    desc, ry, ru, rv = TpuIntraTreeEncoder(ps, cfg).encode_frame(y, u, v, qp)
    assert np.array_equal(np.asarray(ry), gy2.astype(np.uint8))
    assert np.array_equal(np.asarray(ru), gu2.astype(np.uint8))
    assert np.array_equal(np.asarray(rv), gv2.astype(np.uint8))
    desc.densify()
    assert np.array_equal(desc.coef_y, gdesc.coef_y)


def test_device_tree_deblock_pipeline_e2e(rng, tmp_path):
    """Pipeline auto-backend with intra_rdo + deblocking now rides the
    device tree path; the stream must FFmpeg-decode bit-exact."""
    import dataclasses
    w, h = 96, 64
    cfg = dataclasses.replace(_tree_cfg(w, h, num_frames_in_flight=2),
                              deblocking=True)
    frames = [_mixed_frame(rng, w, h) for _ in range(2)]
    bits, nals, recons = _encode_bits(cfg, frames)
    path = tmp_path / "tree_dbk.265"
    path.write_bytes(nals)
    decoded = decode_annexb(path)
    assert len(decoded) == 2
    for i in range(2):
        assert np.array_equal(decoded[i], recons[i]["y"]), f"frame {i}"


def test_device_tree_pipeline_e2e(rng, tmp_path):
    """Full pipeline with the device tree backend (batched, packed wire):
    stream must FFmpeg-decode bit-exact to recon across a 3-frame batch."""
    w, h = 96, 64
    cfg = _tree_cfg(w, h, num_frames_in_flight=3)
    frames = [_mixed_frame(rng, w, h) for _ in range(3)]
    bits, nals, recons = _encode_bits(cfg, frames)
    path = tmp_path / "tree_dev.265"
    path.write_bytes(nals)
    decoded = decode_annexb(path)
    assert len(decoded) == 3
    for i in range(3):
        assert np.array_equal(decoded[i], recons[i]["y"]), f"frame {i}"


def test_device_tree_sao_pipeline_e2e(rng, tmp_path):
    """Device tree path with DEVICE SAO (decide+apply inside the intra
    program, params on the wire): stream must FFmpeg-decode bit-exact to
    the (SAO-filtered) recon, and the desc must carry device sao_params
    (host sao_decide must not run)."""
    w, h = 96, 64
    import dataclasses
    cfg = dataclasses.replace(_tree_cfg(w, h), sao=True, deblocking=True)
    frames = [_mixed_frame(rng, w, h) for _ in range(2)]
    # noisy second frame so SAO has real offsets to pick
    y2, u2, v2 = frames[1]
    frames[1] = (np.clip(y2.astype(int)
                         + rng.randint(-8, 9, y2.shape), 0, 255)
                 .astype(np.uint8), u2, v2)
    bits, nals, recons = _encode_bits(cfg, frames)
    path = tmp_path / "tree_dev_sao.265"
    path.write_bytes(nals)
    decoded = decode_annexb(path)
    assert len(decoded) == 2
    for i in range(2):
        assert np.array_equal(decoded[i], recons[i]["y"]), f"frame {i}"


def test_device_tree_sao_picks_offsets(rng):
    """On noisy content the device-decided SAO must actually turn on for
    some CTB (otherwise the in-program decide is dead code)."""
    from homerhevc_tpu.engine.intra_tree_encoder import TpuIntraTreeEncoder
    import dataclasses
    w, h = 96, 64
    cfg = dataclasses.replace(_tree_cfg(w, h), sao=True, deblocking=True)
    ps = ParamSets.from_config(cfg)
    y, u, v = _mixed_frame(rng, w, h)
    y = np.clip(y.astype(int) + rng.randint(-10, 11, y.shape),
                0, 255).astype(np.uint8)
    enc = TpuIntraTreeEncoder(ps, cfg)
    desc, ry, ru, rv = enc.encode_frame(y, u, v, 32)
    p = desc.sao_params
    assert p is not None
    assert (p.type_luma != 0).any() or (p.type_chroma != 0).any()
