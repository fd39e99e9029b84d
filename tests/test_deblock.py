"""Deblocking: device vs golden bit-exactness, and e2e conformance with
deblocking enabled (our stream -> FFmpeg -> must equal our deblocked recon)."""

import numpy as np
import jax.numpy as jnp
import pytest

from homerhevc_tpu.config import EncoderConfig
from homerhevc_tpu.golden import deblock as gdb
from homerhevc_tpu.ops import deblock as ddb
from tests.conftest import decode_annexb, make_yuv


def test_device_luma_matches_golden(rng):
    h = w = 64
    bsize, qp = 16, 32
    plane = rng.randint(0, 256, (h, w)).astype(np.int32)
    tu8 = np.full((h // 8, w // 8), bsize, np.int32)
    bs_v, bs_h = gdb.intra_bs_maps(tu8)
    qp8 = np.full((h // 8, w // 8), qp, np.int32)
    gold = gdb.deblock_plane_luma(plane, tu8, qp8, bs_v, bs_h)
    dev = np.asarray(ddb.deblock_luma_uniform(jnp.asarray(plane), bsize, qp))
    assert np.array_equal(gold, dev)


def test_device_chroma_matches_golden(rng):
    h = w = 64  # chroma plane of a 128x128 frame
    plane = rng.randint(0, 256, (h, w)).astype(np.int32)
    qp, off = 32, 2
    # golden chroma uses luma-unit maps of the 128x128 luma frame
    tu8 = np.full((2 * h // 8, 2 * w // 8), 16, np.int32)
    bs_v, bs_h = gdb.intra_bs_maps(tu8)
    qp8 = np.full((2 * h // 8, 2 * w // 8), qp, np.int32)
    gold = gdb.deblock_plane_chroma(plane, qp8, bs_v, bs_h, chroma_qp_offset=off)
    dev = np.asarray(ddb.deblock_chroma_uniform(jnp.asarray(plane), 16, qp,
                                                chroma_qp_off=off))
    assert np.array_equal(gold, dev)


def test_e2e_deblock_on(tmp_path, rng):
    from homerhevc_tpu.api import Encoder
    w, h = 128, 64
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=0, sao=False,
                        deblocking=True, sign_hiding=True, cu_size=16)
    enc = Encoder(cfg)
    y, u, v = make_yuv(rng, w, h)
    efs = list(enc.encode(y, u, v)) + list(enc.flush())
    path = tmp_path / "db.265"
    with open(path, "wb") as f:
        f.write(efs[0].annex_b())
    dec = decode_annexb(path)
    assert len(dec) == 1
    assert np.array_equal(dec[0], efs[0].recon["y"]), \
        "FFmpeg decode != our deblocked recon"
