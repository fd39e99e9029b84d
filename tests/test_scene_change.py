"""Scene change -> GOP reinit (reference: reinit_gop_on_scene_change)."""

import numpy as np

from homerhevc_tpu.config import EncoderConfig
from tests.conftest import decode_annexb, make_yuv


def test_scene_change_reinits_gop(tmp_path, rng):
    from homerhevc_tpu.api import Encoder
    w, h = 64, 64
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=1, intra_period=0,
                        sao=False, deblocking=False, sign_hiding=True,
                        cu_size=16, reinit_gop_on_scene_change=True)
    enc = Encoder(cfg)
    y1, u1, v1 = make_yuv(rng, w, h)
    # totally different scene
    y2 = (255 - y1[::-1, ::-1]).copy()
    efs = []
    path = tmp_path / "sc.265"
    with open(path, "wb") as f:
        for fr in [(y1, u1, v1), (y1, u1, v1), (y2, u1, v1), (y2, u1, v1)]:
            for ef in enc.encode(*fr):
                f.write(ef.annex_b())
                efs.append(ef)
        for ef in enc.flush():
            f.write(ef.annex_b())
            efs.append(ef)
    types = [e.frame_type for e in efs]
    assert types == ["I", "P", "I", "P"], types
    dec = decode_annexb(path)
    assert len(dec) == 4
    for i in range(4):
        assert np.array_equal(dec[i], efs[i].recon["y"])


def test_adaptive_threshold_no_cut_on_steady_fast_motion():
    """A steadily fast-moving noisy clip keeps a high frame-to-frame MAD;
    the adaptive detector (running level + deviation) must NOT fire on
    every frame the way a fixed constant would, but must still fire on a
    hard scene transition (reference analog: intra-ratio detection is
    content-relative, hmr_motion_inter.c:3791)."""
    from homerhevc_tpu.engine.pipeline import EncoderPipeline
    rng = np.random.RandomState(12)
    w, h = 64, 64
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=1,
                        intra_period=0, sao=False, deblocking=False,
                        sign_hiding=False, cu_size=16)
    pipe = EncoderPipeline(cfg, backend="golden")
    wide, _, _ = make_yuv(rng, w * 4, h)
    cuts = []
    for t in range(8):
        y = wide[:, t * 8:t * 8 + w]          # fast 8px/frame pan
        cuts.append(pipe._scene_change(y))
    assert sum(cuts) <= 1, f"steady motion misread as cuts: {cuts}"
    y_new = (255 - wide[:, :w][::-1]).copy()  # hard transition
    assert pipe._scene_change(y_new)
