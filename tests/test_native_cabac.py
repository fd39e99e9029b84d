"""The C++ serializer must be byte-identical to the Python serializer."""

import numpy as np
import pytest

from homerhevc_tpu.config import EncoderConfig
from homerhevc_tpu.engine.pipeline import EncoderPipeline
from homerhevc_tpu.hevc.bitstream import NAL_IDR_W_RADL
from tests.conftest import make_yuv


@pytest.mark.parametrize("sbh", [False, True])
@pytest.mark.parametrize("cu_size", [16, 64])
def test_native_matches_python(sbh, cu_size, rng):
    from homerhevc_tpu import native
    if native.get_lib() is None:
        pytest.skip("no compiler")
    w, h = 128, 64
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=0, sao=False,
                        deblocking=False, sign_hiding=sbh, cu_size=cu_size)
    pipe = EncoderPipeline(cfg, backend="golden")
    y, u, v = make_yuv(rng, w, h)
    desc, ry, ru, rv = pipe._analyze_intra(y, u, v)
    nal_py = pipe._serialize_slice(desc, 2, NAL_IDR_W_RADL, cfg.qp,
                                   use_native=False)
    nal_cc = pipe._serialize_slice(desc, 2, NAL_IDR_W_RADL, cfg.qp,
                                   use_native=True)
    assert nal_py == nal_cc
