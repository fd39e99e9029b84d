"""Per-CTB adaptive quantization (cu_qp_delta) tests.

Conformance: streams with per-CTB QP deltas must FFmpeg-decode bit-exactly
to the encoder's own reconstruction (both serializers), and the repo's own
parser must recover the decoder-view QP map (reference analog: per-CTU RC
QP, hmr_rate_control.c:266-347; delta syntax hmr_arithmetic_encoding.c
delta-QP coder :1502).
"""

import numpy as np
import pytest

from homerhevc_tpu.api import Encoder
from homerhevc_tpu.config import EncoderConfig
from tests.conftest import decode_annexb, make_yuv


def test_aq_map_shape_and_clamp():
    from homerhevc_tpu.engine.rate_control import aq_qp_map
    rng = np.random.RandomState(0)
    y = rng.randint(0, 256, (64, 128)).astype(np.uint8)
    y[:32, :64] = 128  # one flat region
    m = aq_qp_map(y, 32, 30, strength=2.0, max_delta=4)
    assert m.shape == (2, 4)
    assert m.min() >= 26 and m.max() <= 34
    # flat CTBs get lower QP than busy ones
    assert m[0, 0] < m[1, 3]


def _encode_aq(tmp_path, w, h, frames=2, name="aq.265", **kw):
    rng = np.random.RandomState(7)
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=0, sao=False,
                        deblocking=True, sign_hiding=True, cu_size=16,
                        aq_strength=2.0, **kw)
    enc = Encoder(cfg)
    path = tmp_path / name
    recons = []
    with open(path, "wb") as f:
        for _ in range(frames):
            y, u, v = make_yuv(rng, w, h)
            # a flat band forces nonzero deltas (variance contrast)
            y[: h // 4] = 90
            for ef in enc.encode(y, u, v):
                f.write(ef.annex_b())
                recons.append(ef.recon)
        for ef in enc.flush():
            f.write(ef.annex_b())
            recons.append(ef.recon)
    return path, recons


def test_aq_e2e_ffmpeg_bit_exact(tmp_path):
    path, recons = _encode_aq(tmp_path, 96, 64)
    decoded = decode_annexb(path)
    assert len(decoded) == len(recons) == 2
    for i, dy in enumerate(decoded):
        assert np.array_equal(dy, recons[i]["y"]), f"frame {i} luma mismatch"


def test_aq_e2e_wpp(tmp_path):
    # WPP: qPY_PREV must reset to the slice QP at each CTB row
    path, recons = _encode_aq(tmp_path, 96, 64, name="aq_wpp.265", wpp=True)
    decoded = decode_annexb(path)
    assert len(decoded) == len(recons)
    for i, dy in enumerate(decoded):
        assert np.array_equal(dy, recons[i]["y"]), f"frame {i} luma mismatch"


def test_aq_python_native_serializers_match(rng):
    """The native C++ serializer's cu_qp_delta payload must be bit-identical
    to the Python SliceDataEncoder's."""
    from homerhevc_tpu.engine.pipeline import EncoderPipeline
    from homerhevc_tpu.engine.rate_control import aq_qp_map
    from homerhevc_tpu.golden.intra_frame import encode_intra_frame
    from homerhevc_tpu.hevc.headers import SLICE_I
    from homerhevc_tpu.native import get_lib
    if get_lib() is None:
        pytest.skip("native library unavailable")
    w, h = 96, 64
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=0, sao=False,
                        deblocking=False, sign_hiding=True, cu_size=16,
                        aq_strength=2.0)
    pipe = EncoderPipeline(cfg, backend="golden")
    y, u, v = make_yuv(np.random.RandomState(3), w, h)
    y[:16] = 80
    qmap = aq_qp_map(y, 16, 30, 2.0)
    assert (qmap != 30).any(), "test content must produce nonzero deltas"
    desc, ry, ru, rv = encode_intra_frame(pipe.ps, y, u, v, 30, cu_size=16,
                                          qp_map=qmap)
    nal_native = pipe._serialize_slice(desc, SLICE_I, 19, 30)
    nal_python = pipe._serialize_slice(desc, SLICE_I, 19, 30,
                                       use_native=False)
    assert nal_native == nal_python


def test_aq_parser_recovers_qp_map(rng):
    """Parse an AQ slice back: coefficients and the decoder-view QP map
    must round-trip (uncoded CTBs inherit the predictor)."""
    from homerhevc_tpu.engine.pipeline import EncoderPipeline
    from homerhevc_tpu.engine.rate_control import aq_qp_map
    from homerhevc_tpu.golden.deblock import decoder_qp_map8
    from homerhevc_tpu.golden.intra_frame import encode_intra_frame
    from homerhevc_tpu.hevc.cabac_dec import CabacDecoder
    from homerhevc_tpu.hevc.ctx_tables import init_contexts
    from homerhevc_tpu.hevc.headers import SLICE_I
    from homerhevc_tpu.hevc.parse import SliceDataParser
    w, h = 96, 64
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=0, sao=False,
                        deblocking=False, sign_hiding=False, cu_size=16,
                        aq_strength=2.0)
    pipe = EncoderPipeline(cfg, backend="golden")
    y, u, v = make_yuv(np.random.RandomState(4), w, h)
    y[:16] = 70
    qmap = aq_qp_map(y, 16, 30, 2.0)
    desc, *_ = encode_intra_frame(pipe.ps, y, u, v, 30, cu_size=16,
                                  qp_map=qmap)
    from homerhevc_tpu.hevc.bitstream import BitWriter
    from homerhevc_tpu.hevc.cabac import CabacEncoder
    from homerhevc_tpu.hevc.syntax import SliceDataEncoder
    bw = BitWriter()
    enc = CabacEncoder(bw, init_contexts("I", 30))
    sd = SliceDataEncoder(pipe.ps, desc, enc, SLICE_I, 30)
    n_ctus = pipe.ps.ctus_x * pipe.ps.ctus_y
    for i in range(n_ctus):
        sd.encode_ctu(i % pipe.ps.ctus_x, i // pipe.ps.ctus_x)
        sd.encode_ctu_end(end_of_slice=(i == n_ctus - 1))
    enc.finish()
    bw.write_byte_alignment()
    from homerhevc_tpu.hevc.cabac_dec import BitReader
    dec = CabacDecoder(BitReader(bw.get_bytes()), init_contexts("I", 30))
    p = SliceDataParser(pipe.ps, w, h, dec, SLICE_I, 30)
    for i in range(n_ctus):
        p.parse_ctu(i % pipe.ps.ctus_x, i // pipe.ps.ctus_x)
        p.parse_ctu_end()
    np.testing.assert_array_equal(p.d.coef_y, desc.coef_y)
    np.testing.assert_array_equal(p.d.coef_u, desc.coef_u)
    np.testing.assert_array_equal(p.d.coef_v, desc.coef_v)
    # parser's decoder-view QP map == the encoder-side inference helper
    expect = decoder_qp_map8(desc, pipe.ps, 30)
    np.testing.assert_array_equal(p.d.qp_map.astype(np.int32), expect)


def test_aq_device_path_ffmpeg_bit_exact(tmp_path):
    """Per-CTB AQ on the DEVICE intra path (deblocking off): the CU16
    wavefront quantizes with per-block QP vectors
    (_encode_frame_impl_aq) and the stream must FFmpeg-decode bit-exact;
    the decoder-view QP map must show real deltas."""
    rng = np.random.RandomState(19)
    w, h = 96, 64
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=0, sao=False,
                        deblocking=False, sign_hiding=True, cu_size=16,
                        aq_strength=2.0)
    from homerhevc_tpu.engine.pipeline import EncoderPipeline
    pipe = EncoderPipeline(cfg)          # backend auto -> device path
    assert pipe._tpu_ok(), "device path must accept AQ with deblock off"
    path = tmp_path / "aq_dev.265"
    recons, descs = [], []
    import homerhevc_tpu.engine.pipeline as pl
    orig = pl.EncoderPipeline._emit
    def patched(self, desc, *a, **kw):
        descs.append(desc)
        return orig(self, desc, *a, **kw)
    pl.EncoderPipeline._emit = patched
    try:
        with open(path, "wb") as f:
            for _ in range(2):
                y, u, v = make_yuv(rng, w, h)
                y[: h // 4] = 90        # flat band -> nonzero deltas
                for ef in pipe.push(y, u, v):
                    f.write(ef.annex_b())
                    recons.append(ef.recon)
            for ef in pipe.flush():
                f.write(ef.annex_b())
                recons.append(ef.recon)
    finally:
        pl.EncoderPipeline._emit = orig
    assert len(recons) == 2
    assert descs[0].qp_map is not None and (descs[0].qp_map != 30).any(), \
        "AQ map carried no deltas"
    decoded = decode_annexb(path)
    assert len(decoded) == 2
    for i, dy in enumerate(decoded):
        assert np.array_equal(dy, recons[i]["y"]), f"frame {i} mismatch"


def test_aq_device_batched_pipeline(tmp_path):
    """AQ through the BATCHED device pipeline (maps ride the pending
    queue + background fetch)."""
    rng = np.random.RandomState(23)
    w, h = 96, 64
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=0, sao=False,
                        deblocking=False, sign_hiding=True, cu_size=16,
                        aq_strength=2.0, num_frames_in_flight=3)
    enc = Encoder(cfg)
    path = tmp_path / "aq_batch.265"
    recons = []
    with open(path, "wb") as f:
        for _ in range(6):
            y, u, v = make_yuv(rng, w, h)
            y[: h // 4] = 85
            for ef in enc.encode(y, u, v):
                f.write(ef.annex_b())
                recons.append(ef.recon)
        for ef in enc.flush():
            f.write(ef.annex_b())
            recons.append(ef.recon)
    assert len(recons) == 6
    decoded = decode_annexb(path)
    assert len(decoded) == 6
    for i, dy in enumerate(decoded):
        assert np.array_equal(dy, recons[i]["y"]), f"frame {i} mismatch"


def test_inter_device_aq_matches_golden(rng):
    """Device inter program with a per-CTB QP map == golden
    encode_inter_frame(qp_map): MVs, coefficients, recon, qp_map."""
    from homerhevc_tpu.engine.inter_encoder import TpuInterEncoder
    from homerhevc_tpu.golden.inter_frame import encode_inter_frame
    from homerhevc_tpu.hevc.headers import ParamSets

    w, h = 128, 64
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=1,
                        intra_period=0, sao=False, deblocking=False,
                        sign_hiding=True, cu_size=16, aq_strength=2.0,
                        reinit_gop_on_scene_change=False)
    ps = ParamSets.from_config(cfg)
    y, u, v = make_yuv(rng, w, h)
    y[:16] = 80                      # flat band -> nonzero deltas
    ry = np.roll(y.astype(np.int32), 3, axis=1)
    ru = np.roll(u.astype(np.int32), 1, axis=1)
    rv = np.roll(v.astype(np.int32), 1, axis=1)
    from homerhevc_tpu.engine.rate_control import aq_qp_map
    qmap = aq_qp_map(y, 16, 30, 2.0)
    assert (qmap != 30).any()
    gd, gy, gu, gv = encode_inter_frame(ps, (y, u, v), (ry, ru, rv), 30,
                                        qp_map=qmap)
    enc = TpuInterEncoder(ps, cfg)
    dd, dy, du, dv = enc.encode_frame((y, u, v), (ry, ru, rv), qp=30,
                                      qp_map=qmap)
    dd.densify()
    assert np.array_equal(gd.mv, dd.mv)
    assert np.array_equal(gd.coef_y, dd.coef_y)
    assert np.array_equal(gd.coef_u, dd.coef_u)
    assert np.array_equal(gd.coef_v, dd.coef_v)
    assert np.array_equal(np.asarray(gy), np.asarray(dy))
    assert np.array_equal(gd.qp_map, dd.qp_map)


def test_inter_aq_e2e_pipeline(tmp_path):
    """IPPP with AQ riding the DEVICE inter path (deblock off): streams
    decode bit-exact; P slices carry cu_qp_delta."""
    rng = np.random.RandomState(3)
    w, h, n = 128, 64, 4
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=1,
                        intra_period=0, sao=False, deblocking=False,
                        sign_hiding=True, cu_size=16, aq_strength=2.0,
                        reinit_gop_on_scene_change=False)
    from homerhevc_tpu.engine.pipeline import EncoderPipeline
    pipe = EncoderPipeline(cfg)
    assert pipe._tpu_inter_ok(), "device inter must accept AQ w/o deblock"
    y, u, v = make_yuv(rng, w, h)
    y[: h // 4] = 90
    recons = []
    path = tmp_path / "aq_inter_dev.265"
    with open(path, "wb") as f:
        for t in range(n):
            y2 = np.roll(y, 2 * t, axis=1)
            y2[: h // 4] = 90
            for ef in pipe.push(y2, u, v):
                f.write(ef.annex_b())
                recons.append(ef.recon)
        for ef in pipe.flush():
            f.write(ef.annex_b())
            recons.append(ef.recon)
    decoded = decode_annexb(path)
    assert len(decoded) == n
    for i, d in enumerate(decoded):
        assert np.array_equal(d, recons[i]["y"]), f"frame {i}"
