"""SAO: e2e conformance (FFmpeg decode == our post-SAO recon) and syntax
round-trip through the parser."""

import numpy as np
import pytest

from homerhevc_tpu.config import EncoderConfig
from tests.conftest import decode_annexb, make_yuv


@pytest.mark.parametrize("deblock", [False, True])
def test_e2e_sao(tmp_path, rng, deblock):
    from homerhevc_tpu.api import Encoder
    w, h = 128, 64
    cfg = EncoderConfig(width=w, height=h, qp=34, gop_size=0, sao=True,
                        deblocking=deblock, sign_hiding=True, cu_size=16)
    enc = Encoder(cfg)
    y, u, v = make_yuv(rng, w, h)
    efs = list(enc.encode(y, u, v)) + list(enc.flush())
    path = tmp_path / "sao.265"
    with open(path, "wb") as f:
        f.write(efs[0].annex_b())
    dec = decode_annexb(path)
    assert len(dec) == 1
    d = np.abs(dec[0].astype(int) - efs[0].recon["y"].astype(int))
    assert d.max() == 0, f"maxdiff {d.max()}"


def test_sao_syntax_roundtrip(rng):
    """Serialize a frame with synthetic SAO params; parse back; compare."""
    from homerhevc_tpu.engine.pipeline import EncoderPipeline
    from homerhevc_tpu.hevc.sao import SaoFrameParams
    from homerhevc_tpu.hevc.syntax import FrameDesc, SliceDataEncoder
    from homerhevc_tpu.hevc.cabac import CabacEncoder
    from homerhevc_tpu.hevc.cabac_dec import BitReader, CabacDecoder
    from homerhevc_tpu.hevc.ctx_tables import init_contexts
    from homerhevc_tpu.hevc.bitstream import BitWriter
    from homerhevc_tpu.hevc.parse import SliceDataParser

    w, h = 64, 32
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=0, sao=True,
                        deblocking=False, sign_hiding=False, cu_size=16)
    pipe = EncoderPipeline(cfg)
    ps = pipe.ps
    desc = FrameDesc.alloc(w, h)
    desc.cu_depth[:] = 0
    desc.luma_mode[:] = 1
    desc.chroma_mode[:] = 1
    sp = SaoFrameParams.alloc(2, 4)
    sp.type_luma[0, 0] = 2; sp.eo_class_luma[0, 0] = 3
    sp.offsets[0, 0, 0] = [1, 2, 0, 7]
    sp.type_chroma[0, 0] = 1
    sp.band_pos[0, 0, 1] = 13; sp.offsets[0, 0, 1] = [0, -2, 3, 0]
    sp.band_pos[0, 0, 2] = 30; sp.offsets[0, 0, 2] = [-1, 0, 0, 5]
    sp.merge_left[0, 1] = True
    sp.copy_from(0, 0, 0, 1)
    sp.merge_up[1, 0] = True
    sp.copy_from(0, 0, 1, 0)
    sp.type_luma[0, 2] = 2; sp.eo_class_luma[0, 2] = 1
    sp.offsets[0, 2, 0] = [3, 0, 1, 0]

    bw = BitWriter()
    enc = CabacEncoder(bw, init_contexts("I", 32))
    sd = SliceDataEncoder(ps, desc, enc, slice_qp=32, sao_params=sp)
    n = 8
    for i in range(n):
        sd.encode_ctu(i % 4, i // 4)
        sd.encode_ctu_end(i == n - 1)
    enc.finish()
    bw.write_byte_alignment()

    br = BitReader(bw.get_bytes())
    dec = CabacDecoder(br, init_contexts("I", 32))
    p = SliceDataParser(ps, w, h, dec, slice_qp=32, sao_enabled=True)
    for i in range(n):
        p.parse_ctu(i % 4, i // 4)
        assert p.parse_ctu_end() == (1 if i == n - 1 else 0)
    q = p.sao
    assert np.array_equal(q.type_luma, sp.type_luma)
    assert np.array_equal(q.type_chroma, sp.type_chroma)
    assert np.array_equal(q.eo_class_luma, sp.eo_class_luma)
    assert np.array_equal(q.band_pos, sp.band_pos)
    assert np.array_equal(q.offsets, np.abs(sp.offsets) *
                          np.where(sp.offsets < 0, -1, 1))


def test_device_sao_ippp_conformance(tmp_path, rng):
    """IPPP with SAO decided+applied INSIDE the device program
    (ops/sao_dev.py): streams must FFmpeg-decode bit-exactly to the
    encoder's own reconstruction, and the device reference chain stays
    resident (P frames predict from the SAO-filtered recon)."""
    from homerhevc_tpu.api import Encoder
    from homerhevc_tpu.config import EncoderConfig
    from tests.conftest import decode_annexb, make_yuv

    w, h = 96, 64
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=1, intra_period=0,
                        sao=True, deblocking=True, sign_hiding=True,
                        cu_size=32, reinit_gop_on_scene_change=False)
    enc = Encoder(cfg)
    y0, u0, v0 = make_yuv(rng, w, h)
    frames = []
    for t in range(5):
        # drifting content + per-frame noise so SAO has real work
        y = np.clip(np.roll(y0, 2 * t, axis=1).astype(np.int32)
                    + rng.randint(-4, 5, (h, w)), 0, 255).astype(np.uint8)
        frames.append((y, np.roll(u0, t, axis=1), np.roll(v0, t, axis=1)))
    efs = []
    path = tmp_path / "dsao.265"
    with open(path, "wb") as f:
        for fr in frames:
            for ef in enc.encode(*fr):
                f.write(ef.annex_b())
                efs.append(ef)
        for ef in enc.flush():
            f.write(ef.annex_b())
            efs.append(ef)
    assert len(efs) == 5
    # at least one P frame must actually switch SAO on somewhere
    assert any(getattr(e, "frame_type", "") == "P" for e in efs)
    dec = decode_annexb(path)
    assert len(dec) == 5
    for i in range(5):
        assert np.array_equal(dec[i], efs[i].recon["y"]), f"frame {i}"


def test_sao_rdo_picks_band_offset():
    """A uniform intensity shift confined to a few bands is exactly what
    band offset fixes and edge offset cannot: the RDO must choose BO and
    the merge RDO must merge identical neighbours (hmr_sao.c:663/:854)."""
    from homerhevc_tpu.hevc.sao import (SAO_BAND, sao_apply_component,
                                        sao_decide)
    h, w = 64, 128
    yy, xx = np.mgrid[0:h, 0:w]
    src = (100 + (xx % 31)).astype(np.int32)        # values 100..130
    rec = src - 4                                    # bands 12..15
    cu = np.full((h // 2, w // 2), 128, np.int32)
    p = sao_decide((src, cu, cu), (rec, cu, cu), 64, 32)
    assert (p.type_luma == SAO_BAND).any(), "BO never chosen"
    assert p.merge_left[0, 1], "identical neighbour not merged"
    out = sao_apply_component(rec, p, 0, 64)
    # the filter must recover most of the shift
    before = np.abs(src - rec).mean()
    after = np.abs(src - out).mean()
    assert after < before * 0.4, (before, after)


def test_device_sao_picks_band_offset():
    """Device twin of the BO test: a uniform shift confined to a few
    intensity bands must make the DEVICE program choose type 1 (band),
    derive the recovering window, and apply it exactly as the host
    filter would (ops/sao_dev.py BO extension; reference band histogram
    in sse_sao_get_ctu_stats, hmr_sse42_sao.c:154, derivation
    hmr_sao.c:480-620)."""
    import jax.numpy as jnp

    from homerhevc_tpu.hevc.sao import SAO_BAND, sao_apply_component
    from homerhevc_tpu.ops.sao_dev import sao_analyze_apply, unpack_params
    from homerhevc_tpu.ops.sao_dev import pack_params
    import homerhevc_tpu.hevc.tables as T

    h, w = 64, 128
    yy, xx = np.mgrid[0:h, 0:w]
    src = (100 + (xx % 31)).astype(np.int32)        # values 100..130
    rec = src - 4                                    # bands 12..15
    cu = np.full((h // 2, w // 2), 128, np.int32)
    lam = int(T.rd_lambda(32, "P") * 256)
    ry, ru, rv, params = sao_analyze_apply(
        jnp.asarray(src), jnp.asarray(cu), jnp.asarray(cu),
        jnp.asarray(rec), jnp.asarray(cu), jnp.asarray(cu), 32, lam)
    p = unpack_params(np.asarray(pack_params(params)), 2, 4)
    assert (p.type_luma == SAO_BAND).any(), "device BO never chosen"
    # the device apply must equal the host (normative) filter with the
    # same params — this is the encoder/decoder consistency invariant
    host = sao_apply_component(rec, p, 0, 32)
    assert np.array_equal(np.asarray(ry), host)
    before = np.abs(src - rec).mean()
    after = np.abs(src - np.asarray(ry)).mean()
    assert after < before * 0.4, (before, after)


def test_device_sao_bo_e2e(tmp_path, rng):
    """IPPP device stream on banding-shift content (BO territory): the
    coded band params must survive serialization — FFmpeg decode equals
    the device-filtered recon on every frame."""
    from homerhevc_tpu.api import Encoder
    from homerhevc_tpu.config import EncoderConfig
    from tests.conftest import decode_annexb

    w, h = 96, 64
    cfg = EncoderConfig(width=w, height=h, qp=34, gop_size=1,
                        intra_period=0, sao=True, deblocking=True,
                        sign_hiding=True, cu_size=32,
                        reinit_gop_on_scene_change=False)
    enc = Encoder(cfg)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (90 + (xx % 37) + (yy % 11)).astype(np.int32)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 132, np.uint8)
    efs = []
    path = tmp_path / "dbo.265"
    with open(path, "wb") as f:
        for t in range(4):
            # smooth drift + banding-range noise: quant error concentrates
            # in a few intensity bands, which BO fixes and EO cannot
            y = np.clip(np.roll(base, t, axis=1)
                        + rng.randint(-2, 3, (h, w)), 0, 255) \
                .astype(np.uint8)
            for ef in enc.encode(y, u, v):
                f.write(ef.annex_b())
                efs.append(ef)
        for ef in enc.flush():
            f.write(ef.annex_b())
            efs.append(ef)
    dec = decode_annexb(path)
    assert len(dec) == len(efs) == 4
    for i in range(4):
        assert np.array_equal(dec[i], efs[i].recon["y"]), f"frame {i}"
