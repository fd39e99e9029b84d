"""IBP GOP (gop_size=2, 1 B frame): decode-order emission, conformance."""

import numpy as np
import pytest

from homerhevc_tpu.config import EncoderConfig
from tests.conftest import decode_annexb, make_yuv


def test_e2e_ibp(tmp_path, rng):
    from homerhevc_tpu.api import Encoder
    w, h = 128, 64
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=2, intra_period=0,
                        sao=False, deblocking=True, sign_hiding=True,
                        cu_size=16)
    enc = Encoder(cfg)
    frames = []
    y, u, v = make_yuv(rng, w, h)
    for t in range(6):
        y2 = np.clip(np.roll(y, 2 * t, 1).astype(int)
                     + rng.randint(-2, 3, y.shape), 0, 255).astype(np.uint8)
        frames.append((y2, u, v))
    efs = []
    path = tmp_path / "ibp.265"
    with open(path, "wb") as f:
        for fr in frames:
            for ef in enc.encode(*fr):
                f.write(ef.annex_b())
                efs.append(ef)
        for ef in enc.flush():
            f.write(ef.annex_b())
            efs.append(ef)
    # decode order: I0 P2 B1 P4 B3 P5(trailing flush)
    assert [e.frame_type for e in efs] == ["I", "P", "B", "P", "B", "P"]
    dec = decode_annexb(path)
    assert len(dec) == 6, f"decoded {len(dec)}/6"
    # FFmpeg outputs in DISPLAY order; efs are decode order.
    display_of_decode = [0, 2, 1, 4, 3, 5]
    recon_by_display = {}
    for ef, dp in zip(efs, display_of_decode):
        recon_by_display[dp] = ef.recon["y"]
    for i in range(6):
        d = np.abs(dec[i].astype(int) - recon_by_display[i].astype(int))
        assert d.max() == 0, f"display frame {i}: maxdiff {d.max()}"


def test_e2e_ibp_ctb32(tmp_path, rng):
    """IBP at CTB32 with the CU-tree device inter path."""
    from homerhevc_tpu.api import Encoder
    w, h = 128, 96
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=2, intra_period=0,
                        sao=False, deblocking=True, sign_hiding=True,
                        cu_size=32, reinit_gop_on_scene_change=False)
    enc = Encoder(cfg)
    y, u, v = make_yuv(rng, w, h)
    efs = []
    path = tmp_path / "ibp32.265"
    with open(path, "wb") as f:
        for t in range(6):
            y2 = np.clip(np.roll(y, 3 * t, 1).astype(int)
                         + rng.randint(-2, 3, y.shape), 0, 255) \
                .astype(np.uint8)
            for ef in enc.encode(y2, u, v):
                f.write(ef.annex_b())
                efs.append(ef)
        for ef in enc.flush():
            f.write(ef.annex_b())
            efs.append(ef)
    # anchor 4 is a generalized-B slice (bi from anchors 2 and 0)
    assert [e.frame_type for e in efs] == ["I", "P", "B", "B", "B", "P"]
    dec = decode_annexb(path)
    assert len(dec) == 6
    for ef, dp in zip(efs, [0, 2, 1, 4, 3, 5]):
        assert np.array_equal(dec[dp], ef.recon["y"]), dp


def test_uni_b_merge_rd_conformance(tmp_path, rng):
    """IBP where the held B falls back to the L0-uni golden tree path
    (CTB32, width not a multiple of 32): merge-RD now runs in B slices
    (restricted to the spatial candidates the decoder's B merge list
    shares); streams must stay bit-exact through FFmpeg."""
    from homerhevc_tpu.engine.pipeline import EncoderPipeline
    w, h, n = 112, 64, 5
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=2,
                        intra_period=0, sao=False, deblocking=True,
                        sign_hiding=True, cu_size=32, intra_in_p=True,
                        reinit_gop_on_scene_change=False)
    pipe = EncoderPipeline(cfg, backend="golden")
    y, u, v = make_yuv(rng, w, h)
    recons = {}
    path = tmp_path / "unib_mrd.265"
    nals = b""
    for t in range(n):
        y2 = np.roll(y, 3 * t, axis=1)
        for ef in pipe.push(y2, u, v):
            nals += ef.annex_b()
            recons[ef.poc] = ef.recon
    for ef in pipe.flush():
        nals += ef.annex_b()
        recons[ef.poc] = ef.recon
    path.write_bytes(nals)
    dec = decode_annexb(path)
    assert len(dec) == n
    for i in range(n):
        assert np.array_equal(dec[i], recons[i]["y"]), f"frame {i}"
