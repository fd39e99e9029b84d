"""End-to-end conformance: encode all-intra -> decode with FFmpeg (OpenCV)
-> decoded luma must be BIT-EXACT equal to the encoder's reconstruction
(the fundamental HEVC encoder invariant, SURVEY.md §4 / homer_app -o-raw)."""

import numpy as np
import pytest

from homerhevc_tpu.api import Encoder
from homerhevc_tpu.config import EncoderConfig
from tests.conftest import decode_annexb, make_yuv


def _roundtrip(tmp_path, w, h, qp, frames=1, rng_seed=5, **cfg_kw):
    rng = np.random.RandomState(rng_seed)
    cfg = EncoderConfig(width=w, height=h, qp=qp, gop_size=0, sao=False,
                        deblocking=False, sign_hiding=False, **cfg_kw)
    enc = Encoder(cfg)
    path = tmp_path / "out.265"
    recons = []
    with open(path, "wb") as f:
        for _ in range(frames):
            y, u, v = make_yuv(rng, w, h)
            for ef in enc.encode(y, u, v):
                f.write(ef.annex_b())
                recons.append(ef.recon)
        for ef in enc.flush():
            f.write(ef.annex_b())
            recons.append(ef.recon)
    decoded = decode_annexb(path)
    assert len(decoded) == frames, f"decoded {len(decoded)}/{frames} frames"
    for i, dec_y in enumerate(decoded):
        diff = np.abs(dec_y.astype(int) - recons[i]["y"].astype(int))
        assert diff.max() == 0, \
            f"frame {i}: decode != recon, maxdiff={diff.max()} at {np.unravel_index(diff.argmax(), diff.shape)}"
    # quality sanity: recon should resemble source
    return recons


def test_e2e_64x64_qp32(tmp_path):
    _roundtrip(tmp_path, 64, 64, 32)


def test_e2e_128x64_qp22(tmp_path):
    _roundtrip(tmp_path, 128, 64, 22)


def test_e2e_nonmultiple_ctu(tmp_path):
    # 80x48: bottom/right partial CTUs force implicit splits
    _roundtrip(tmp_path, 80, 48, 30)


def test_e2e_sign_hiding(tmp_path):
    rng = np.random.RandomState(9)
    cfg = EncoderConfig(width=64, height=64, qp=27, gop_size=0, sao=False,
                        deblocking=False, sign_hiding=True)
    enc = Encoder(cfg)
    y, u, v = make_yuv(rng, 64, 64)
    import tempfile, os
    path = tmp_path / "sbh.265"
    with open(path, "wb") as f:
        for ef in enc.encode(y, u, v):
            f.write(ef.annex_b())
            rec = ef.recon
    decoded = decode_annexb(path)
    assert len(decoded) == 1
    assert np.array_equal(decoded[0], rec["y"])


def test_e2e_multi_frame(tmp_path):
    _roundtrip(tmp_path, 64, 64, 32, frames=3)
