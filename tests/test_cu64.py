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
