"""The TPU wavefront intra encoder must match the golden encoder bit-exactly
and produce conformant streams."""

import numpy as np
import pytest

from homerhevc_tpu.config import EncoderConfig
from homerhevc_tpu.engine.intra_encoder import TpuIntraEncoder
from homerhevc_tpu.engine.pipeline import EncoderPipeline
from homerhevc_tpu.golden.intra_frame import encode_intra_frame
from homerhevc_tpu.hevc.headers import ParamSets
from tests.conftest import decode_annexb, make_yuv


@pytest.mark.parametrize("sbh", [False, True])
def test_device_matches_golden(sbh, rng):
    w = h = 64
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=0, sao=False,
                        deblocking=False, sign_hiding=sbh, cu_size=16)
    ps = ParamSets.from_config(cfg)
    y, u, v = make_yuv(rng, w, h)
    gd, gy, gu, gv = encode_intra_frame(ps, y, u, v, cfg.qp, cu_size=16)
    enc = TpuIntraEncoder(ps, cfg, cu=16)
    dd, dy, du, dv = enc.encode_frame(y, u, v, cfg.qp)
    dd.densify()     # device descs carry the CG wire, not dense planes
    assert np.array_equal(gd.luma_mode, dd.luma_mode), "mode decisions differ"
    assert np.array_equal(gd.coef_y, dd.coef_y), "luma levels differ"
    assert np.array_equal(gd.coef_u, dd.coef_u), "cb levels differ"
    assert np.array_equal(gd.coef_v, dd.coef_v), "cr levels differ"
    assert np.array_equal(gy, dy), "luma recon differs"
    assert np.array_equal(gu, du) and np.array_equal(gv, dv), "chroma recon"


def test_device_e2e_decodes(tmp_path, rng):
    w, h = 128, 64
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=0, sao=False,
                        deblocking=False, sign_hiding=True, cu_size=16)
    pipe = EncoderPipeline(cfg, backend="tpu")
    y, u, v = make_yuv(rng, w, h)
    efs = list(pipe.push(y, u, v))
    path = tmp_path / "dev.265"
    with open(path, "wb") as f:
        f.write(efs[0].annex_b())
    dec = decode_annexb(path)
    assert len(dec) == 1
    assert np.array_equal(dec[0], efs[0].recon["y"]), "decode != recon"
