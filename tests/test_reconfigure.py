"""Mid-stream reconfiguration (analog of HOMER_enc_control re-SETCFG,
reference hmr_encoder_lib.c:727-738: SETCFG tears down and rebuilds the
engines; here the pipeline is drained and restarted, next frame = IDR)."""

import numpy as np

from homerhevc_tpu.config import BitrateMode, EncoderConfig
from tests.conftest import decode_annexb, make_yuv


def _run(enc, frames, sink, path_bytes):
    for fr in frames:
        for ef in enc.encode(*fr):
            path_bytes.append(ef.annex_b())
            sink.append(ef)


def test_reconfigure_qp_switch(tmp_path, rng):
    """QP change mid-stream: one continuous Annex-B file, decodable end to
    end, IDR at the switch, lower bits after."""
    from homerhevc_tpu.api import Encoder
    w, h = 96, 64
    cfg = EncoderConfig(width=w, height=h, qp=28, gop_size=1,
                        intra_period=0, sao=False, deblocking=True,
                        sign_hiding=True, cu_size=16)
    enc = Encoder(cfg)
    y, u, v = make_yuv(rng, w, h)
    frames = [(np.roll(y, 2 * t, 1), u, v) for t in range(8)]
    efs, chunks = [], []
    _run(enc, frames[:4], efs, chunks)
    drained = enc.reconfigure(qp=40)
    efs.extend(drained)
    chunks.extend(ef.annex_b() for ef in drained)
    assert len(efs) == 4
    n_first = len(efs)
    _run(enc, frames[4:], efs, chunks)
    tail = list(enc.flush())
    efs.extend(tail)
    chunks.extend(ef.annex_b() for ef in tail)
    assert len(efs) == 8
    # the first frame after the switch restarts the stream: IDR + POC 0
    assert efs[n_first].frame_type == "I"
    assert efs[n_first].poc == 0
    # soft reconfigure keeps the compiled device encoder objects
    path = tmp_path / "switch.265"
    path.write_bytes(b"".join(chunks))
    dec = decode_annexb(path)
    assert len(dec) == 8
    for i, ef in enumerate(efs):
        assert np.array_equal(dec[i], ef.recon["y"]), f"frame {i}"
    # QP 40 codes fewer bits than QP 28 on the same content
    bits_a = sum(e.bits for e in efs[1:4])
    bits_b = sum(e.bits for e in efs[n_first + 1:])
    assert bits_b < 0.6 * bits_a


def test_reconfigure_bitrate_and_validation(rng):
    """Bitrate/mode retune reuses compiled encoders; unknown fields raise."""
    from homerhevc_tpu.api import Encoder
    w, h = 96, 64
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=1,
                        intra_period=0, sao=False, deblocking=False,
                        sign_hiding=True, cu_size=16)
    enc = Encoder(cfg)
    y, u, v = make_yuv(rng, w, h)
    for _ in enc.encode(y, u, v):
        pass
    old_intra = enc._pipeline._tpu_intra
    enc.reconfigure(bitrate_mode=BitrateMode.CBR, bitrate_kbps=300,
                    frame_rate=30.0)
    assert enc.cfg.bitrate_kbps == 300
    if old_intra is not None:
        assert enc._pipeline._tpu_intra is old_intra
    # geometry-side change rebuilds (no stale compiled objects carried)
    enc2 = Encoder(cfg)
    for _ in enc2.encode(y, u, v):
        pass
    enc2.reconfigure(sao=True)
    assert enc2._pipeline._tpu_intra is None
    try:
        enc.reconfigure(nonexistent_knob=1)
    except ValueError as e:
        assert "nonexistent_knob" in str(e)
    else:
        raise AssertionError("unknown field accepted")
