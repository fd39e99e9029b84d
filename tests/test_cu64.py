"""CU64 inter coding path (CTB64 three-level CU tree) tests.

Reference analog: CU64 is the reference's default CTB (homer_app.c:307-337);
depth consolidation hmr_motion_inter.c:3116-3290. Luma TU structure of a
CU64 is four forced-split TU32s (spec: log2CbSize > Log2MaxTrafoSize).
"""

import numpy as np

from homerhevc_tpu.api import Encoder
from homerhevc_tpu.config import EncoderConfig
from tests.conftest import decode_annexb, make_yuv


def _run_ippp(tmp_path, w, h, frames, name, **kw):
    rng = np.random.RandomState(11)
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=1, cu_size=64,
                        sao=False, deblocking=True, sign_hiding=True,
                        intra_period=0, **kw)
    enc = Encoder(cfg)
    path = tmp_path / name
    recons = []
    base = make_yuv(rng, w, h)
    with open(path, "wb") as f:
        for t in range(frames):
            # smooth translation: CU64s should win on large coherent motion
            y = np.roll(base[0], t * 2, axis=1)
            u = np.roll(base[1], t, axis=1)
            v = np.roll(base[2], t, axis=1)
            for ef in enc.encode(y, u, v):
                f.write(ef.annex_b())
                recons.append(ef.recon)
        for ef in enc.flush():
            f.write(ef.annex_b())
            recons.append(ef.recon)
    return path, recons


def test_cu64_ippp_ffmpeg_bit_exact(tmp_path):
    path, recons = _run_ippp(tmp_path, 128, 64, 3, "cu64.265")
    decoded = decode_annexb(path)
    assert len(decoded) == len(recons) == 3
    for i, dy in enumerate(decoded):
        assert np.array_equal(dy, recons[i]["y"]), f"frame {i} luma mismatch"


def test_cu64_is_actually_chosen():
    """On large coherent motion the 64-level must win at least one CTB
    (guards against the third level silently never activating)."""
    from homerhevc_tpu.engine.pipeline import EncoderPipeline
    from homerhevc_tpu.golden.inter_frame import encode_inter_frame_tree
    rng = np.random.RandomState(3)
    w, h = 128, 128
    cfg = EncoderConfig(width=w, height=h, qp=35, gop_size=1, cu_size=64,
                        sao=False, deblocking=False, sign_hiding=False,
                        intra_period=0)
    pipe = EncoderPipeline(cfg, backend="golden")
    y, u, v = make_yuv(rng, w, h)
    ry = np.roll(y, 3, axis=1).astype(np.int32)
    ru = np.roll(u, 1, axis=1).astype(np.int32)
    rv = np.roll(v, 1, axis=1).astype(np.int32)
    desc, *_ = encode_inter_frame_tree(pipe.ps, (y, u, v), (ry, ru, rv),
                                       35, search=16)
    assert (desc.cu_depth == 0).any(), "no CTB adopted the CU64 coding"
    # every CU64 region must carry the forced TU32 split marker
    cu64 = desc.cu_depth == 0
    assert (desc.tr_depth[cu64] == 1).all()


def test_cu64_mixed_depths_parse(tmp_path):
    """A CTB64 P slice with mixed CU64/CU32/CU16 depths must parse back
    bin-exactly through the repo's own parser."""
    from homerhevc_tpu.engine.pipeline import EncoderPipeline
    from homerhevc_tpu.golden.inter_frame import encode_inter_frame_tree
    from homerhevc_tpu.hevc.bitstream import BitWriter
    from homerhevc_tpu.hevc.cabac import CabacEncoder
    from homerhevc_tpu.hevc.cabac_dec import CabacDecoder
    from homerhevc_tpu.hevc.ctx_tables import init_contexts
    from homerhevc_tpu.hevc.headers import SLICE_P
    from homerhevc_tpu.hevc.parse import SliceDataParser
    from homerhevc_tpu.hevc.syntax import SliceDataEncoder
    rng = np.random.RandomState(5)
    w, h = 128, 64
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=1, cu_size=64,
                        sao=False, deblocking=False, sign_hiding=True,
                        intra_period=0)
    pipe = EncoderPipeline(cfg, backend="golden")
    y, u, v = make_yuv(rng, w, h)
    # half the frame translates coherently, half gets fresh noise ->
    # mixed depths
    ry = np.roll(y, 2, axis=1).astype(np.int32)
    ry[:, w // 2:] = rng.randint(0, 256, (h, w // 2))
    ru = np.roll(u, 1, axis=1).astype(np.int32)
    rv = np.roll(v, 1, axis=1).astype(np.int32)
    desc, *_ = encode_inter_frame_tree(pipe.ps, (y, u, v), (ry, ru, rv),
                                       32, search=8)
    bw = BitWriter()
    enc = CabacEncoder(bw, init_contexts("P", 32))
    sd = SliceDataEncoder(pipe.ps, desc, enc, SLICE_P, 32)
    n_ctus = pipe.ps.ctus_x * pipe.ps.ctus_y
    for i in range(n_ctus):
        sd.encode_ctu(i % pipe.ps.ctus_x, i // pipe.ps.ctus_x)
        sd.encode_ctu_end(end_of_slice=(i == n_ctus - 1))
    enc.finish()
    bw.write_byte_alignment()
    from homerhevc_tpu.hevc.cabac_dec import BitReader
    dec = CabacDecoder(BitReader(bw.get_bytes()), init_contexts("P", 32))
    p = SliceDataParser(pipe.ps, w, h, dec, SLICE_P, 32)
    for i in range(n_ctus):
        p.parse_ctu(i % pipe.ps.ctus_x, i // pipe.ps.ctus_x)
        p.parse_ctu_end()
    np.testing.assert_array_equal(p.d.coef_y, desc.coef_y)
    np.testing.assert_array_equal(p.d.cu_depth, desc.cu_depth)
    np.testing.assert_array_equal(p.d.mv, desc.mv)


def test_device_ctb64_tree_matches_golden(rng):
    """Device CTB64 three-level tree (CU64/32/16) == golden
    encode_inter_frame_tree want64: depths, MVs, coefficients, recon."""
    from homerhevc_tpu.engine.inter_encoder import TpuInterEncoder
    from homerhevc_tpu.golden.inter_frame import encode_inter_frame_tree
    from homerhevc_tpu.hevc.headers import ParamSets

    w, h = 128, 64
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=1,
                        intra_period=0, sao=False, deblocking=False,
                        sign_hiding=True, cu_size=64,
                        reinit_gop_on_scene_change=False)
    ps = ParamSets.from_config(cfg)
    # smooth gradient + global shift: CU64 should win on flat regions;
    # a busy corner forces sub-splits
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    y0 = np.clip(60 + 0.4 * xx + 0.3 * yy, 0, 255).astype(np.uint8)
    y0[:24, :24] = (rng.rand(24, 24) * 255).astype(np.uint8)
    u0 = np.full((h // 2, w // 2), 120, np.uint8)
    v0 = np.full((h // 2, w // 2), 136, np.uint8)
    y1 = np.clip(np.roll(y0, 2, 1).astype(int)
                 + rng.randint(-2, 3, y0.shape), 0, 255).astype(np.uint8)
    refs = tuple(p.astype(np.int32) for p in (y0, u0, v0))
    gd, gy_, gu_, gv_ = encode_inter_frame_tree(ps, (y1, u0, v0), refs, 32)
    dd, dy_, du_, dv_ = TpuInterEncoder(ps, cfg).encode_frame(
        (y1, u0, v0), (y0, u0, v0))
    dd.densify()
    assert np.array_equal(gd.cu_depth, dd.cu_depth)
    assert (gd.cu_depth == 0).any(), "no CU64 chosen - content too hard"
    assert np.array_equal(gd.tr_depth, dd.tr_depth)
    assert np.array_equal(gd.mv, dd.mv)
    assert np.array_equal(gd.coef_y, dd.coef_y)
    assert np.array_equal(gd.coef_u, dd.coef_u)
    assert np.array_equal(gd.coef_v, dd.coef_v)
    assert np.array_equal(np.asarray(dy_), gy_.astype(np.uint8))
    assert np.array_equal(np.asarray(du_), gu_.astype(np.uint8))
    assert np.array_equal(np.asarray(dv_), gv_.astype(np.uint8))
    for f in ("skip", "inter_mode", "merge_idx", "mvp_flag", "root_cbf"):
        assert np.array_equal(getattr(gd, f), getattr(dd, f)), f


def test_device_ctb64_e2e_conformance(tmp_path, rng):
    """IPPP at CTB64 on the DEVICE path (deblock on): FFmpeg-bit-exact."""
    from homerhevc_tpu.engine.pipeline import EncoderPipeline
    w, h, n = 128, 64, 4
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=1,
                        intra_period=0, sao=False, deblocking=True,
                        sign_hiding=True, cu_size=64,
                        reinit_gop_on_scene_change=False)
    pipe = EncoderPipeline(cfg)
    assert pipe._tpu_inter_ok(), "CTB64 device gate"
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    y = np.clip(60 + 0.4 * xx + 30 * np.sin(yy / 9.0), 0, 255) \
        .astype(np.uint8)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 136, np.uint8)
    recons = []
    path = tmp_path / "ctb64_dev.265"
    with open(path, "wb") as f:
        for t in range(n):
            y2 = np.clip(np.roll(y, 2 * t, 1).astype(int)
                         + rng.randint(-3, 4, y.shape), 0, 255) \
                .astype(np.uint8)
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
