"""Conformance-window padding: non-CTU-multiple dims are coded padded and
cropped on output (SPS conf_win), so every path sees full CTBs — the device
path now covers 1080p-style dims (1080 % 16 != 0)."""

import numpy as np
import pytest

from homerhevc_tpu.api import Encoder
from homerhevc_tpu.config import EncoderConfig
from conftest import decode_annexb, make_yuv


@pytest.mark.parametrize("dims,cu,gop", [
    ((64, 40), 16, 0),    # 1080p-shaped: height pads 40 -> 48
    ((64, 40), 16, 1),    # inter chain on padded planes
    ((88, 72), 32, 0),    # both dims pad (88->96, 72->96), CTB32
])
def test_conf_window_e2e(tmp_path, rng, dims, cu, gop):
    w, h = dims
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=gop,
                        intra_period=0 if gop == 0 else 100,
                        sao=False, deblocking=True, sign_hiding=True,
                        cu_size=cu)
    enc = Encoder(cfg)
    frames = [make_yuv(rng, w, h) for _ in range(3)]
    path = tmp_path / "cw.265"
    efs = []
    with open(path, "wb") as f:
        for fr in frames:
            for ef in enc.encode(*fr):
                f.write(ef.annex_b())
                efs.append(ef)
        for ef in enc.flush():
            f.write(ef.annex_b())
            efs.append(ef)
    assert len(efs) == 3
    for ef in efs:
        assert ef.recon["y"].shape == (h, w)
        assert ef.recon["u"].shape == (h // 2, w // 2)
    dec = decode_annexb(path)
    assert len(dec) == 3
    for i, d in enumerate(dec):
        # FFmpeg applies the conformance window -> display-size luma,
        # bit-exact vs the encoder's cropped reconstruction
        assert d.shape == (h, w)
        assert np.array_equal(d, efs[i].recon["y"]), f"frame {i}"


def test_conf_window_psnr_sane(tmp_path, rng):
    """Padding must not leak into the visible region."""
    w, h = 64, 40
    cfg = EncoderConfig(width=w, height=h, qp=22, gop_size=0, sao=False,
                        deblocking=False, sign_hiding=True, cu_size=16)
    enc = Encoder(cfg)
    y, u, v = make_yuv(rng, w, h)
    efs = list(enc.encode(y, u, v)) + list(enc.flush())
    ry = efs[0].recon["y"].astype(np.int32)
    mse = float(np.mean((ry - y.astype(np.int32)) ** 2))
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
    assert psnr > 35.0, psnr
