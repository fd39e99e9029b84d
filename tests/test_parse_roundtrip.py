"""Serializer -> parser round-trip for P slices (the parser is the
conformance/debug oracle; it must invert the serializer exactly)."""

import numpy as np
import pytest

from homerhevc_tpu.config import EncoderConfig
from homerhevc_tpu.engine.pipeline import EncoderPipeline
from homerhevc_tpu.hevc.bitstream import BitWriter
from homerhevc_tpu.hevc.cabac import CabacEncoder
from homerhevc_tpu.hevc.cabac_dec import BitReader, CabacDecoder
from homerhevc_tpu.hevc.ctx_tables import init_contexts
from homerhevc_tpu.hevc.headers import SLICE_P
from homerhevc_tpu.hevc.parse import SliceDataParser
from homerhevc_tpu.hevc.syntax import SliceDataEncoder
from tests.conftest import make_yuv


def test_p_slice_roundtrip(rng):
    w, h = 128, 64
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=1, intra_period=0,
                        sao=False, deblocking=False, sign_hiding=True,
                        cu_size=16)
    pipe = EncoderPipeline(cfg)
    y, u, v = make_yuv(rng, w, h)
    list(pipe.push(y, u, v)) + list(pipe.flush())
    y2 = np.clip(np.roll(y, 5, 1).astype(int) + rng.randint(-3, 4, y.shape),
                 0, 255).astype(np.uint8)
    desc, *_ = pipe._analyze_inter(y2, u, v, qp=30)

    bw = BitWriter()
    enc = CabacEncoder(bw, init_contexts("P", 30))
    sd = SliceDataEncoder(pipe.ps, desc, enc, SLICE_P, 30)
    n = pipe.ps.ctus_x * pipe.ps.ctus_y
    for i in range(n):
        sd.encode_ctu(i % pipe.ps.ctus_x, i // pipe.ps.ctus_x)
        sd.encode_ctu_end(i == n - 1)
    enc.finish()
    bw.write_byte_alignment()

    br = BitReader(bw.get_bytes())
    dec = CabacDecoder(br, init_contexts("P", 30))
    p = SliceDataParser(pipe.ps, w, h, dec, SLICE_P, 30)
    for i in range(n):
        p.parse_ctu(i % pipe.ps.ctus_x, i // pipe.ps.ctus_x)
        assert p.parse_ctu_end() == (1 if i == n - 1 else 0)
    assert np.array_equal(p.d.mv, desc.mv)
    assert np.array_equal(p.d.skip, desc.skip)
    assert np.array_equal(p.d.inter_mode, desc.inter_mode)
    assert np.array_equal(p.d.coef_y, desc.coef_y)
    assert np.array_equal(p.d.coef_u, desc.coef_u)
    assert np.array_equal(p.d.coef_v, desc.coef_v)
