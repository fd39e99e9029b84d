"""Per-CU uni/bi prediction direction selection in B slices (reference
analog: per-CU inter direction in hmr_cu_motion_estimation,
hmr_motion_inter.c:2471-2880) and the spec 8.5.3.2.6 AMVP POC-distance
scaling it requires with mixed-direction neighbours."""

import numpy as np
import pytest

from homerhevc_tpu.config import EncoderConfig
from homerhevc_tpu.hevc.headers import ParamSets, SLICE_B
from homerhevc_tpu.hevc.inter import scale_mv

from conftest import make_yuv


def test_scale_mv_spec_values():
    # identity at equal distances
    assert scale_mv(7, -3, 2, 2) == (7, -3)
    # doubling: neighbour at distance 1, target at distance 2
    # tx = (16384+0)//1 = 16384; dsf = (2*16384+32)>>6 = 512
    # mv'x = (|512*4| + 127) >> 8 = 8 (exact doubling w/ rounding)
    assert scale_mv(4, 0, 2, 1) == (8, 0)
    # halving: neighbour at distance 2, target 1: tx=(16384+1)//2=8192
    # dsf = (8192+32)>>6 = 128 -> mv/2 rounded
    assert scale_mv(4, -6, 1, 2) == (2, -3)
    # opposite sides (IBP B): target future (-1), neighbour past (+1)
    # tb=-1, td=1: tx=16384, dsf=clip((-16384+32)>>6)=-4096 -> negate
    sx, sy = scale_mv(5, -2, -1, 1)
    assert (sx, sy) == (-5, 2)


def _b_setup(rng, w, h, qp=30, noise=12):
    cfg = EncoderConfig(width=w, height=h, qp=qp, gop_size=2, cu_size=32,
                        sao=False, deblocking=True, sign_hiding=True)
    ps = ParamSets.from_config(cfg)
    f0 = make_yuv(rng, w, h)
    # moving + noisy so residuals are nonzero and uni/bi choices vary
    y1 = np.clip(np.roll(f0[0], 3, 1).astype(int)
                 + rng.randint(-noise, noise + 1, f0[0].shape),
                 0, 255).astype(np.uint8)
    f1 = (y1, f0[1], f0[2])
    y2 = np.clip(np.roll(f0[0], 6, 1).astype(int)
                 + rng.randint(-3, 4, f0[0].shape), 0, 255).astype(np.uint8)
    f2 = (y2, f0[1], f0[2])
    return cfg, ps, f0, f1, f2


@pytest.mark.parametrize("dists", [(1, -1), (1, 2)])
def test_golden_unibi_parse_roundtrip(rng, dists):
    """Golden B encode with mixed directions: python serializer output
    parses back to the identical desc (coefs, dirs, per-list MVs) through
    the two-list AMVP-with-scaling derivation, and the native C++
    serializer is byte-exact to the python one."""
    from homerhevc_tpu import native
    from homerhevc_tpu.golden.intra_frame import encode_intra_frame
    from homerhevc_tpu.golden.inter_frame import encode_b_frame_tree
    from homerhevc_tpu.hevc.bitstream import BitWriter
    from homerhevc_tpu.hevc.cabac import CabacEncoder
    from homerhevc_tpu.hevc.cabac_dec import BitReader, CabacDecoder
    from homerhevc_tpu.hevc.ctx_tables import init_contexts
    from homerhevc_tpu.hevc.parse import SliceDataParser
    from homerhevc_tpu.hevc.syntax import SliceDataEncoder

    w, h = 96, 64
    cfg, ps, f0, f1, f2 = _b_setup(rng, w, h)
    _, r0y, r0u, r0v = encode_intra_frame(ps, *f0, cfg.qp, cu_size=32)
    _, r2y, r2u, r2v = encode_intra_frame(ps, *f2, cfg.qp, cu_size=32)
    desc, ry, ru, rv = encode_b_frame_tree(
        ps, f1, (r0y, r0u, r0v), (r2y, r2u, r2v), cfg.qp, search=8,
        dists=dists)
    assert desc.coef_y.any(), "want nonzero residuals for this test"

    bw = BitWriter()
    enc = CabacEncoder(bw, init_contexts("B", cfg.qp))
    sd = SliceDataEncoder(ps, desc, enc, SLICE_B, cfg.qp, ref_dists=dists)
    n_ctus = ps.ctus_x * ps.ctus_y
    for i in range(n_ctus):
        sd.encode_ctu(i % ps.ctus_x, i // ps.ctus_x)
        sd.encode_ctu_end(end_of_slice=(i == n_ctus - 1))
    enc.finish()
    bw.write_byte_alignment()
    payload = bw.get_bytes()

    dec = CabacDecoder(BitReader(payload), init_contexts("B", cfg.qp))
    pr = SliceDataParser(ps, w, h, dec, SLICE_B, cfg.qp, ref_dists=dists)
    for i in range(n_ctus):
        pr.parse_ctu(i % ps.ctus_x, i // ps.ctus_x)
        assert dec.decode_terminate() == (i == n_ctus - 1)
    assert np.array_equal(pr.d.coef_y, desc.coef_y)
    assert np.array_equal(pr.d.coef_u, desc.coef_u)
    assert np.array_equal(pr.d.inter_dir, desc.inter_dir)
    m0 = (desc.inter_dir & 1) != 0
    m1 = (desc.inter_dir & 2) != 0
    assert np.array_equal(pr.d.mv[m0], desc.mv[m0])
    assert np.array_equal(pr.d.mv_l1[m1], desc.mv_l1[m1])

    pl2 = native.encode_slice_native(ps, desc, init_contexts("B", cfg.qp),
                                     ps.sign_hiding, slice_type=0,
                                     ref_dists=dists)
    assert pl2 == payload


def test_device_unibi_matches_golden(rng):
    """Device _impl_b (per-CU uni/bi) is bit-exact to the golden twin."""
    import jax.numpy as jnp
    from homerhevc_tpu.engine.inter_encoder import TpuInterEncoder
    from homerhevc_tpu.golden.intra_frame import encode_intra_frame
    from homerhevc_tpu.golden.inter_frame import encode_b_frame_tree

    w, h = 96, 64
    cfg, ps, f0, f1, f2 = _b_setup(rng, w, h)
    _, r0y, r0u, r0v = encode_intra_frame(ps, *f0, cfg.qp, cu_size=32)
    _, r2y, r2u, r2v = encode_intra_frame(ps, *f2, cfg.qp, cu_size=32)
    gdesc, gy, gu, gv = encode_b_frame_tree(
        ps, f1, (r0y, r0u, r0v), (r2y, r2u, r2v), cfg.qp, search=8,
        dists=(1, -1))

    enc = TpuInterEncoder(ps, cfg, search=8)
    ddesc, dy, du, dv = enc.encode_frame_b(
        f1, (np.asarray(r0y, np.uint8), np.asarray(r0u, np.uint8),
             np.asarray(r0v, np.uint8)),
        (np.asarray(r2y, np.uint8), np.asarray(r2u, np.uint8),
         np.asarray(r2v, np.uint8)), qp=cfg.qp, ref_dists=(1, -1))
    assert np.array_equal(ddesc.inter_dir, gdesc.inter_dir)
    assert np.array_equal(ddesc.mv, gdesc.mv)
    assert np.array_equal(ddesc.mv_l1, gdesc.mv_l1)
    assert np.array_equal(ddesc.coef_y, gdesc.coef_y)
    assert np.array_equal(ddesc.coef_u, gdesc.coef_u)
    assert np.array_equal(ddesc.coef_v, gdesc.coef_v)
    assert np.array_equal(np.asarray(dy), np.asarray(gy, np.uint8))
    assert np.array_equal(np.asarray(du), np.asarray(gu, np.uint8))
    assert np.array_equal(np.asarray(dv), np.asarray(gv, np.uint8))


def test_e2e_ibp_bi_anchors(tmp_path, rng):
    """IBP at CTB32 with generalized-B anchors: from the third anchor on,
    anchors bi-predict from the two previous anchors (refs poc-2/poc-4 via
    ref list modification). Stream must stay FFmpeg-decodable bit-exact."""
    from homerhevc_tpu.api import Encoder
    from conftest import decode_annexb

    w, h = 128, 96
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=2, intra_period=0,
                        sao=False, deblocking=True, sign_hiding=True,
                        cu_size=32, reinit_gop_on_scene_change=False)
    enc = Encoder(cfg)
    y, u, v = make_yuv(rng, w, h)
    efs = []
    path = tmp_path / "ibp_bi_anchor.265"
    with open(path, "wb") as f:
        for t in range(8):
            y2 = np.clip(np.roll(y, 3 * t, 1).astype(int)
                         + rng.randint(-2, 3, y.shape), 0, 255) \
                .astype(np.uint8)
            for ef in enc.encode(y2, u, v):
                f.write(ef.annex_b())
                efs.append(ef)
        for ef in enc.flush():
            f.write(ef.annex_b())
            efs.append(ef)
    # decode order I0 P2 B1 A4 B3 A6 B5 P7; anchors >= poc 4 are B slices
    assert [e.frame_type for e in efs] == \
        ["I", "P", "B", "B", "B", "B", "B", "P"]
    dec = decode_annexb(path)
    assert len(dec) == 8
    for ef, dp in zip(efs, [0, 2, 1, 4, 3, 6, 5, 7]):
        assert np.array_equal(dec[dp], ef.recon["y"]), dp


def test_e2e_gpb_two_refs(tmp_path, rng):
    """num_ref_frames=2 (GPB low-delay): frames after the second predict
    from t-1 AND t-2 as generalized-B slices. Regression for the PPS
    num_ref_idx_l0_default_active bug: the encoder codes refidx 0 in every
    list (t-2 rides L1 via l1_swap), so the PPS must pin the active ref
    count per list to 1 — a count of 2 made FFmpeg parse a ref_idx bin the
    serializer never wrote (CABAC desync, whole-frame corruption)."""
    from homerhevc_tpu.api import Encoder
    from conftest import decode_annexb

    w, h = 128, 96
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=1, intra_period=0,
                        sao=False, deblocking=True, sign_hiding=True,
                        cu_size=32, num_ref_frames=2,
                        reinit_gop_on_scene_change=False)
    enc = Encoder(cfg)
    y, u, v = make_yuv(rng, w, h)
    efs = []
    path = tmp_path / "gpb.265"
    with open(path, "wb") as f:
        for t in range(6):
            y2 = np.clip(np.roll(y, 2 * t, 1).astype(int)
                         + rng.randint(-2, 3, y.shape), 0, 255) \
                .astype(np.uint8)
            for ef in enc.encode(y2, u, v):
                f.write(ef.annex_b())
                efs.append(ef)
        for ef in enc.flush():
            f.write(ef.annex_b())
            efs.append(ef)
    # low delay: decode order == display order; gpb kicks in once two
    # references exist
    assert [e.frame_type for e in efs] == ["I", "P", "B", "B", "B", "B"]
    dec = decode_annexb(path)
    assert len(dec) == 6
    for i, ef in enumerate(efs):
        assert np.array_equal(dec[i], ef.recon["y"]), i
