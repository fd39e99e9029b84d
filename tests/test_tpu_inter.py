"""Device P-frame encoder must match the golden inter encoder bit-exactly."""

import numpy as np
import pytest

from homerhevc_tpu.config import EncoderConfig
from homerhevc_tpu.engine.inter_encoder import TpuInterEncoder
from homerhevc_tpu.golden.inter_frame import encode_inter_frame
from homerhevc_tpu.hevc.headers import ParamSets
from tests.conftest import make_yuv


@pytest.mark.parametrize("sbh", [False, True])
def test_device_inter_matches_golden(sbh, rng):
    w, h = 128, 64
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=1, intra_period=0,
                        sao=False, deblocking=False, sign_hiding=sbh,
                        cu_size=16)
    ps = ParamSets.from_config(cfg)
    y, u, v = make_yuv(rng, w, h)
    # reference picture: shifted + noisy copy (odd shift to exercise the
    # half-pel chroma interpolation path)
    ry = np.roll(y, 3, axis=1).astype(np.int32)
    ru = np.roll(u, 1, axis=1).astype(np.int32)
    rv = np.roll(v, 1, axis=1).astype(np.int32)
    gd, gy, gu, gv = encode_inter_frame(ps, (y, u, v), (ry, ru, rv), cfg.qp)
    enc = TpuInterEncoder(ps, cfg)
    dd, dy, du, dv = enc.encode_frame((y, u, v), (ry, ru, rv))
    assert np.array_equal(gd.mv, dd.mv), "MVs differ"
    assert np.array_equal(gd.coef_y, dd.coef_y)
    assert np.array_equal(gd.coef_u, dd.coef_u)
    assert np.array_equal(gd.coef_v, dd.coef_v)
    assert np.array_equal(gy, dy) and np.array_equal(gu, du) \
        and np.array_equal(gv, dv)
    assert np.array_equal(gd.skip, dd.skip)
    assert np.array_equal(gd.inter_mode, dd.inter_mode)
    assert np.array_equal(gd.merge_idx, dd.merge_idx)
    assert np.array_equal(gd.mvp_flag, dd.mvp_flag)
