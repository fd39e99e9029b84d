"""RD_FULL intra tree: NxN 4x4 partitions, TU splits and chroma-mode RDO
(reference: encode_intra 2Nx2N|NxN hmr_motion_intra.c:1731, TU-tree loop
:1443-1586, chroma list hmr_motion_intra_chroma.c:92-110)."""

import numpy as np

from homerhevc_tpu.config import EncoderConfig, RDMode
from tests.conftest import decode_annexb, make_yuv


def _cfg(w, h, **kw):
    return EncoderConfig(width=w, height=h, qp=30, gop_size=0, sao=False,
                         deblocking=False, sign_hiding=True, cu_size=32,
                         intra_rdo=True, rd_mode=RDMode.RD_FULL, **kw)


def test_full_rd_features_activate():
    from homerhevc_tpu.engine.pipeline import EncoderPipeline
    from homerhevc_tpu.golden.intra_tree import decide_intra_tree
    rng = np.random.RandomState(2)
    w, h = 64, 64
    pipe = EncoderPipeline(_cfg(w, h), backend="golden")
    y, u, v = make_yuv(rng, w, h)
    # sharp diagonal structure at fine scale encourages NxN/TU splits
    y[::3, :] = 240
    dec = decide_intra_tree(pipe.ps, y.astype(np.int32),
                            u.astype(np.int32), v.astype(np.int32), 30,
                            ctb=32, full_rd=True)
    assert dec.nxn8 is not None and dec.tr8 is not None
    # chroma RDO must deviate from DM somewhere on real content
    assert (dec.chroma8 != dec.mode8).any()


def test_full_rd_e2e_ffmpeg_bit_exact(tmp_path):
    from homerhevc_tpu.api import Encoder
    from homerhevc_tpu.engine.pipeline import EncoderPipeline
    rng = np.random.RandomState(6)
    w, h = 96, 64
    cfg = _cfg(w, h)
    enc = Encoder(cfg)
    enc._pipeline = EncoderPipeline(cfg, backend="golden")
    y, u, v = make_yuv(rng, w, h)
    y[::3, :] = 240           # force fine structure
    path = tmp_path / "fullrd.265"
    recons = []
    with open(path, "wb") as f:
        for ef in list(enc.encode(y, u, v)) + list(enc.flush()):
            f.write(ef.annex_b())
            recons.append(ef.recon)
    # the stream must actually exercise the new syntax
    d = enc._pipeline
    decoded = decode_annexb(path)
    assert len(decoded) == 1
    assert np.array_equal(decoded[0], recons[0]["y"])


def test_full_rd_parser_roundtrip():
    """Streams with NxN + tr_depth + non-DM chroma must parse back
    bin-exactly (full YUV check through the repo's own parser)."""
    from homerhevc_tpu.engine.pipeline import EncoderPipeline
    from homerhevc_tpu.golden.intra_tree import (decide_intra_tree,
                                                 encode_intra_tree_frame)
    from homerhevc_tpu.hevc.bitstream import BitWriter
    from homerhevc_tpu.hevc.cabac import CabacEncoder
    from homerhevc_tpu.hevc.cabac_dec import BitReader, CabacDecoder
    from homerhevc_tpu.hevc.ctx_tables import init_contexts
    from homerhevc_tpu.hevc.parse import SliceDataParser
    from homerhevc_tpu.hevc.syntax import SliceDataEncoder
    rng = np.random.RandomState(9)
    w, h = 64, 64
    pipe = EncoderPipeline(_cfg(w, h), backend="golden")
    y, u, v = make_yuv(rng, w, h)
    y[::3, :] = 240
    dec = decide_intra_tree(pipe.ps, y.astype(np.int32),
                            u.astype(np.int32), v.astype(np.int32), 30,
                            ctb=32, full_rd=True)
    desc, *_ = encode_intra_tree_frame(pipe.ps, y.astype(np.int32),
                                       u.astype(np.int32),
                                       v.astype(np.int32), 30, dec, ctb=32)
    assert desc.part_nxn.any() or (desc.tr_depth == 1).any(), \
        "test content did not trigger NxN or TU splits"
    bw = BitWriter()
    enc = CabacEncoder(bw, init_contexts("I", 30))
    sd = SliceDataEncoder(pipe.ps, desc, enc, slice_qp=30)
    n = pipe.ps.ctus_x * pipe.ps.ctus_y
    for i in range(n):
        sd.encode_ctu(i % pipe.ps.ctus_x, i // pipe.ps.ctus_x)
        sd.encode_ctu_end(i == n - 1)
    enc.finish()
    bw.write_byte_alignment()
    p = SliceDataParser(pipe.ps, w, h,
                        CabacDecoder(BitReader(bw.get_bytes()),
                                     init_contexts("I", 30)),
                        slice_qp=30)
    for i in range(n):
        p.parse_ctu(i % pipe.ps.ctus_x, i // pipe.ps.ctus_x)
        p.parse_ctu_end()
    np.testing.assert_array_equal(p.d.coef_y, desc.coef_y)
    np.testing.assert_array_equal(p.d.coef_u, desc.coef_u)
    np.testing.assert_array_equal(p.d.coef_v, desc.coef_v)
    np.testing.assert_array_equal(p.d.part_nxn, desc.part_nxn)
    np.testing.assert_array_equal(p.d.luma_mode, desc.luma_mode)
    np.testing.assert_array_equal(p.d.chroma_mode, desc.chroma_mode)


def test_full_rd_native_serializer_matches_python():
    """Native C++ payloads for RD_FULL streams (NxN partitions, TU
    splits, non-DM chroma modes) must be bit-identical to Python's."""
    import pytest
    from homerhevc_tpu.engine.pipeline import EncoderPipeline
    from homerhevc_tpu.golden.intra_tree import (decide_intra_tree,
                                                 encode_intra_tree_frame)
    from homerhevc_tpu.hevc.headers import SLICE_I
    from homerhevc_tpu.native import get_lib
    if get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.RandomState(2)
    w, h = 64, 64
    pipe = EncoderPipeline(_cfg(w, h), backend="golden")
    y, u, v = make_yuv(rng, w, h)
    y[::3, :] = 240
    dec = decide_intra_tree(pipe.ps, y.astype(np.int32),
                            u.astype(np.int32), v.astype(np.int32), 30,
                            ctb=32, full_rd=True)
    desc, *_ = encode_intra_tree_frame(pipe.ps, y.astype(np.int32),
                                       u.astype(np.int32),
                                       v.astype(np.int32), 30, dec, ctb=32)
    assert desc.part_nxn.any() or (desc.tr_depth == 1).any()
    a = pipe._serialize_slice(desc, SLICE_I, 19, 30)
    b = pipe._serialize_slice(desc, SLICE_I, 19, 30, use_native=False)
    assert a == b
