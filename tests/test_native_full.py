"""Native serializer byte-equality vs Python across P slices, SAO, WPP."""

import numpy as np
import pytest

from homerhevc_tpu.config import EncoderConfig
from homerhevc_tpu.engine.pipeline import EncoderPipeline
from homerhevc_tpu.hevc.bitstream import NAL_IDR_W_RADL, NAL_TRAIL_R
from tests.conftest import make_yuv


def _frames(rng, w, h):
    y, u, v = make_yuv(rng, w, h)
    y2 = np.clip(np.roll(y, 3, 1).astype(int) + rng.randint(-2, 3, y.shape),
                 0, 255).astype(np.uint8)
    return (y, u, v), (y2, u, v)


def test_native_p_slice(rng):
    from homerhevc_tpu import native
    if native.get_lib() is None:
        pytest.skip("no compiler")
    w, h = 128, 64
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=1, intra_period=0,
                        sao=False, deblocking=False, sign_hiding=True,
                        cu_size=16)
    pipe = EncoderPipeline(cfg)
    f0, f1 = _frames(rng, w, h)
    list(pipe.push(*f0)) + list(pipe.flush())
    desc, ry, ru, rv = pipe._analyze_inter(*f1, qp=30)
    from homerhevc_tpu.hevc.headers import SLICE_P
    a = pipe._serialize_slice(desc, SLICE_P, NAL_TRAIL_R, 30, use_native=False)
    b = pipe._serialize_slice(desc, SLICE_P, NAL_TRAIL_R, 30, use_native=True)
    assert a == b


def test_native_sao_and_wpp(rng):
    from homerhevc_tpu import native
    if native.get_lib() is None:
        pytest.skip("no compiler")
    w, h = 128, 64
    cfg = EncoderConfig(width=w, height=h, qp=34, gop_size=0, sao=True,
                        deblocking=False, sign_hiding=True, cu_size=16)
    pipe = EncoderPipeline(cfg)
    f0, _ = _frames(rng, w, h)
    desc, ry, ru, rv = pipe._analyze_intra(*f0, qp=34)
    from homerhevc_tpu.hevc.sao import sao_decide
    sao = sao_decide(f0, (ry, ru, rv), 16, 34)
    a = pipe._serialize_slice(desc, 2, NAL_IDR_W_RADL, 34, use_native=False,
                              sao_params=sao)
    b = pipe._serialize_slice(desc, 2, NAL_IDR_W_RADL, 34, use_native=True,
                              sao_params=sao)
    assert a == b
    # WPP: compare native-wpp NAL against python-wpp NAL
    import homerhevc_tpu.native as nat
    real = nat.encode_slice_native
    pipe2 = EncoderPipeline(
        EncoderConfig(width=w, height=h, qp=34, gop_size=0, sao=True,
                      deblocking=False, sign_hiding=True, cu_size=16,
                      wpp=True))
    pipe2.gop_poc = pipe.gop_poc
    nal_native = pipe2._serialize_slice_wpp(desc, 2, NAL_IDR_W_RADL, 34,
                                            sao_params=sao)
    try:
        nat.encode_slice_native = lambda *a, **k: None
        nal_python = pipe2._serialize_slice_wpp(desc, 2, NAL_IDR_W_RADL, 34,
                                                sao_params=sao)
    finally:
        nat.encode_slice_native = real
    assert nal_native == nal_python
