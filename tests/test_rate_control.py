"""Rate control: CBR streams track the target bitrate and stay conformant."""

import numpy as np
import pytest

from homerhevc_tpu.config import BitrateMode, EncoderConfig
from tests.conftest import decode_annexb, make_yuv


def test_cbr_tracks_target(tmp_path, rng):
    from homerhevc_tpu.api import Encoder
    w, h, n = 128, 64, 24
    fps = 25.0
    kbps = 400
    cfg = EncoderConfig(width=w, height=h, frame_rate=fps, gop_size=1,
                        intra_period=12, sao=False, deblocking=True,
                        sign_hiding=True, cu_size=16,
                        bitrate_mode=BitrateMode.CBR, bitrate_kbps=kbps)
    enc = Encoder(cfg)
    # moving textured content so bits are nontrivial
    y, u, v = make_yuv(rng, w, h)
    efs = []
    path = tmp_path / "cbr.265"
    with open(path, "wb") as f:
        for t in range(n):
            y2 = np.roll(y, t, axis=1)
            y2 = np.clip(y2.astype(int) + rng.randint(-3, 4, y2.shape),
                         0, 255).astype(np.uint8)
            for ef in enc.encode(y2, u, v):
                f.write(ef.annex_b())
                efs.append(ef)
        for ef in enc.flush():
            f.write(ef.annex_b())
            efs.append(ef)
    assert len(efs) == n
    # conformance still holds under varying QP
    dec = decode_annexb(path)
    assert len(dec) == n
    for i in range(n):
        assert np.array_equal(dec[i], efs[i].recon["y"]), f"frame {i}"
    total_bits = sum(ef.bits for ef in efs)
    achieved_kbps = total_bits * fps / n / 1000.0
    # steady-state bitrate within 40% of target on this short clip
    assert 0.5 * kbps < achieved_kbps < 1.6 * kbps, achieved_kbps
    # QP must actually adapt
    qps = {ef.avg_qp for ef in efs}
    assert len(qps) > 1, "RC never changed QP"
