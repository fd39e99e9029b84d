"""WPP (entropy_coding_sync): per-row substreams with context forking must
produce conformant streams (FFmpeg decode == recon)."""

import numpy as np
import pytest

from homerhevc_tpu.config import EncoderConfig
from tests.conftest import decode_annexb, make_yuv


@pytest.mark.parametrize("gop", [0, 1])
def test_e2e_wpp(tmp_path, rng, gop):
    from homerhevc_tpu.api import Encoder
    w, h = 128, 64  # 8x4 CTU16 grid -> 4 substreams
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=gop,
                        intra_period=0 if gop else 100, sao=False,
                        deblocking=True, sign_hiding=True, cu_size=16,
                        wpp=True)
    enc = Encoder(cfg)
    frames = []
    y, u, v = make_yuv(rng, w, h)
    frames.append((y, u, v))
    y2 = np.clip(np.roll(y, 2, 1).astype(int) + rng.randint(-2, 3, y.shape),
                 0, 255).astype(np.uint8)
    frames.append((y2, u, v))
    efs = []
    path = tmp_path / "wpp.265"
    with open(path, "wb") as f:
        for fr in frames:
            for ef in enc.encode(*fr):
                f.write(ef.annex_b())
                efs.append(ef)
        for ef in enc.flush():
            f.write(ef.annex_b())
            efs.append(ef)
    dec = decode_annexb(path)
    assert len(dec) == 2
    for i in range(2):
        assert np.array_equal(dec[i], efs[i].recon["y"]), f"frame {i}"
