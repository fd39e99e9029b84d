"""Default quantization scaling lists (spec 7.4.5 / Table 7-5,7-6;
reference hmr_tables.c:199-253 default lists, hmr_quant.c:172-220 use).

Conformance: streams encoded with scaling_list_enabled=1 (default lists,
no explicit SPS lists) must decode bit-exact to the encoder recon via
FFmpeg — proving quant, dequant AND the SPS flag agree with a real
decoder's default-list reconstruction on both the intra and inter paths.
"""

import numpy as np
import pytest

from homerhevc_tpu.api import Encoder
from homerhevc_tpu.config import EncoderConfig
from tests.conftest import decode_annexb, make_yuv


def _roundtrip(tmp_path, name, frames=2, **cfg_kw):
    rng = np.random.RandomState(11)
    cfg = EncoderConfig(width=128, height=64, qp=30, scaling_lists=True,
                        **cfg_kw)
    enc = Encoder(cfg)
    path = tmp_path / f"{name}.265"
    recons = []
    y, u, v = make_yuv(rng, 128, 64)
    with open(path, "wb") as f:
        for t in range(frames):
            fy = np.roll(y, 2 * t, axis=1)
            for ef in enc.encode(fy, u, v):
                f.write(ef.annex_b())
                recons.append(ef.recon)
        for ef in enc.flush():
            f.write(ef.annex_b())
            recons.append(ef.recon)
    decoded = decode_annexb(path)
    assert len(decoded) == frames
    for i, dy in enumerate(decoded):
        assert np.array_equal(dy, recons[i]["y"]), f"frame {i} decode!=recon"


def test_scaling_lists_allintra(tmp_path):
    _roundtrip(tmp_path, "sl_intra", gop_size=0, sao=False,
               deblocking=False, sign_hiding=True)


def test_scaling_lists_ippp(tmp_path):
    _roundtrip(tmp_path, "sl_ippp", frames=3, gop_size=1, sao=False,
               deblocking=False, sign_hiding=True, intra_period=0)


def test_scaling_lists_full_tools(tmp_path):
    """Scaling lists together with SAO + deblock + SBH (the north-star
    tool set)."""
    _roundtrip(tmp_path, "sl_full", frames=3, gop_size=1, sao=True,
               deblocking=True, sign_hiding=True, intra_period=0)


def test_default_lists_differ_from_flat():
    """The default lists must actually change quantization (guards
    against the flag silently selecting flat lists everywhere)."""
    from homerhevc_tpu.golden.quantize import quantize
    rng = np.random.RandomState(3)
    coef = rng.randint(-200, 200, (16, 16)).astype(np.int32)
    a = quantize(coef, 30, True, scaling_lists=False)
    b = quantize(coef, 30, True, scaling_lists=True)
    assert not np.array_equal(a, b)
    # DC of the default 16x16 intra list is 16 (flat): DC behaves the same
    from homerhevc_tpu.hevc import tables as T
    sl = T.scaling_list(16, True)
    assert sl[0, 0] == 16
    # high-frequency weights exceed 16 => coarser HF quantization
    assert sl[-1, -1] > 16
