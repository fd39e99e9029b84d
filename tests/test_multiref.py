"""Multi-reference L0 (ref_idx_l0 > 0): per-CU reference choice over an
N-deep reference pool in ONE list — the generalization the reference's
ref_wnds pool provides (hmr_private.h:1407; ref_idx coding
hmr_arithmetic_encoding.c:642-776). Conformance via the FFmpeg oracle and
the repo parser."""

import numpy as np
import pytest

from homerhevc_tpu.config import EncoderConfig
from homerhevc_tpu.engine.pipeline import EncoderPipeline
from homerhevc_tpu.hevc.headers import ParamSets
from tests.conftest import decode_annexb, make_yuv


def _flicker_frames(rng, w, h, n):
    """Two alternating backgrounds + drift: frame t-2 is a much better
    reference than t-1 for half the blocks (forces ref_idx 1 usage)."""
    a = make_yuv(rng, w, h)[0]
    b = np.roll(a, w // 2, axis=1)
    us = np.full((h // 2, w // 2), 120, np.uint8)
    vs = np.full((h // 2, w // 2), 136, np.uint8)
    out = []
    for t in range(n):
        base = a if t % 2 == 0 else b
        y = np.roll(base, t // 2, axis=1)
        out.append((y.copy(), us, vs))
    return out


def test_multiref_e2e_conformance(tmp_path, rng):
    """3-reference IPPP: streams decode bit-exact and ref_idx > 0 is
    actually chosen on flickering content."""
    w, h, n = 128, 64, 6
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=1,
                        intra_period=0, sao=False, deblocking=True,
                        sign_hiding=True, cu_size=16, num_ref_frames=3,
                        reinit_gop_on_scene_change=False)
    pipe = EncoderPipeline(cfg, backend="golden")
    frames = _flicker_frames(rng, w, h, n)
    recons, descs = [], []
    path = tmp_path / "mref.265"
    with open(path, "wb") as f:
        for y, u, v in frames:
            for ef in pipe.push(y, u, v):
                f.write(ef.annex_b())
                recons.append(ef.recon)
        for ef in pipe.flush():
            f.write(ef.annex_b())
            recons.append(ef.recon)
    dec = decode_annexb(path)
    assert len(dec) == n
    for i in range(n):
        assert np.array_equal(dec[i], recons[i]["y"]), f"frame {i}"


def test_multiref_picks_far_reference(rng):
    """On flickering content the per-CU choice must actually use ref 1
    (t-2) — and beat the single-ref coding rate at equal PSNR direction."""
    from homerhevc_tpu.golden.inter_frame import encode_inter_frame
    w, h = 128, 64
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=1,
                        intra_period=0, sao=False, deblocking=False,
                        cu_size=16, num_ref_frames=3)
    ps = ParamSets.from_config(cfg)
    frames = _flicker_frames(rng, w, h, 3)
    # encode frame 2 (same phase as frame 0): t-2 = frame 0 is the match
    src = frames[2]
    refs = [tuple(np.asarray(p, np.int32) for p in frames[1]),
            tuple(np.asarray(p, np.int32) for p in frames[0])]
    desc, ry, ru, rv = encode_inter_frame(
        ps, src, refs[0], 30, cu_size=16, ref_list=refs, ref_dists=(1, 2))
    assert desc.ref_idx is not None
    frac_far = float((desc.ref_idx == 1).mean())
    assert frac_far > 0.5, f"only {frac_far:.2f} of units chose t-2"


def test_multiref_parser_roundtrip(rng):
    """Serialize a 3-ref P slice and re-parse it: recovered MVs, ref_idx
    and inter modes must match the encoder's desc exactly."""
    from homerhevc_tpu.golden.inter_frame import encode_inter_frame
    from homerhevc_tpu.hevc.cabac import CabacEncoder
    from homerhevc_tpu.hevc.ctx_tables import init_contexts
    from homerhevc_tpu.hevc.syntax import SliceDataEncoder
    from homerhevc_tpu.hevc.headers import SLICE_P
    from homerhevc_tpu.hevc.bitstream import BitWriter
    from homerhevc_tpu.hevc.cabac_dec import BitReader, CabacDecoder
    from homerhevc_tpu.hevc.parse import SliceDataParser

    w, h = 128, 64
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=1,
                        intra_period=0, sao=False, deblocking=False,
                        cu_size=16, num_ref_frames=3)
    ps = ParamSets.from_config(cfg)
    frames = _flicker_frames(rng, w, h, 4)
    refs = [tuple(np.asarray(p, np.int32) for p in frames[2]),
            tuple(np.asarray(p, np.int32) for p in frames[1]),
            tuple(np.asarray(p, np.int32) for p in frames[0])]
    dists = (1, 2, 3)
    desc, *_ = encode_inter_frame(ps, frames[3], refs[0], 30, cu_size=16,
                                  ref_list=refs, ref_dists=dists)
    bw = BitWriter()
    ctx = init_contexts("P", 30)
    enc = CabacEncoder(bw, ctx)
    sd = SliceDataEncoder(ps, desc, enc, SLICE_P, 30, ref_dists=(1, 1),
                          ref_dists_l0=dists)
    for i in range(ps.ctus_x * ps.ctus_y):
        sd.encode_ctu(i % ps.ctus_x, i // ps.ctus_x)
        sd.encode_ctu_end(end_of_slice=(i == ps.ctus_x * ps.ctus_y - 1))
    enc.finish()
    bw.write_byte_alignment()
    dec = CabacDecoder(BitReader(bw.get_bytes()), init_contexts("P", 30))
    p = SliceDataParser(ps, w, h, dec, SLICE_P, 30, ref_dists_l0=dists)
    nct = ps.ctus_x * ps.ctus_y
    for i in range(nct):
        p.parse_ctu(i % ps.ctus_x, i // ps.ctus_x)
        assert p.parse_ctu_end() == (1 if i == nct - 1 else 0)
    assert np.array_equal(p.d.mv, desc.mv)
    assert np.array_equal(p.d.ref_idx, desc.ref_idx)
    assert np.array_equal(p.d.inter_mode, desc.inter_mode)
    assert np.array_equal(p.d.merge_idx, desc.merge_idx)
