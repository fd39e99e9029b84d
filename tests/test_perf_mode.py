"""performance_mode wiring (reference hmr_encoder_lib.c:921-947:
fast_skip_loop / performance_min_depth analogs on the golden CU-tree
path) and the num_b <-> gop_size coupling."""

import numpy as np
import pytest

from homerhevc_tpu.config import EncoderConfig, PerformanceMode
from homerhevc_tpu.engine.pipeline import EncoderPipeline
from tests.conftest import decode_annexb, make_yuv


def _run(tmp_path, perf, rng, cu_size=64):
    cfg = EncoderConfig(width=128, height=64, qp=32, gop_size=1,
                        cu_size=cu_size, sao=False, deblocking=False,
                        intra_period=0, performance_mode=perf)
    pipe = EncoderPipeline(cfg, backend="golden")
    rng2 = np.random.RandomState(7)
    y, u, v = make_yuv(rng2, 128, 64)
    efs = []
    # a shifted second frame so inter coding has real motion
    y2 = np.roll(y, 3, axis=1)
    u2 = np.roll(u, 1, axis=1)
    v2 = np.roll(v, 1, axis=1)
    for fy, fu, fv in ((y, u, v), (y2, u2, v2)):
        efs.extend(pipe.push(fy, fu, fv))
    efs.extend(pipe.flush())
    path = tmp_path / f"perf{int(perf)}.265"
    with open(path, "wb") as f:
        for ef in efs:
            f.write(ef.annex_b())
    dec = decode_annexb(path)
    assert len(dec) == len(efs)
    for d, ef in zip(dec, efs):
        assert np.array_equal(d, ef.recon["y"]), "decode != recon"
    return efs


@pytest.mark.parametrize("perf", [PerformanceMode.FULL_COMPUTATION,
                                  PerformanceMode.FAST,
                                  PerformanceMode.UFAST])
def test_perf_modes_conformant(tmp_path, rng, perf):
    """Every performance mode must still produce FFmpeg-decodable,
    recon-exact streams."""
    _run(tmp_path, perf, rng)


def test_ufast_skips_cu64(rng):
    """UFAST raises min CU depth: the golden inter tree must adopt no
    CU64 (cu_depth 0 at CTB64) — the consolidation pass is skipped
    (reference performance_min_depth=1)."""
    from homerhevc_tpu.golden.inter_frame import encode_inter_frame_tree
    from homerhevc_tpu.golden.intra_frame import encode_intra_frame
    from homerhevc_tpu.hevc.headers import ParamSets
    w, h = 128, 64
    rng2 = np.random.RandomState(7)
    y, u, v = make_yuv(rng2, w, h)
    # smooth content with uniform shift: CU64 would normally win somewhere
    y = (y // 4 + 96).astype(np.uint8)
    y2 = np.roll(y, 2, axis=1)
    descs = {}
    for perf in (PerformanceMode.FULL_COMPUTATION, PerformanceMode.UFAST):
        cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=1,
                            cu_size=64, sao=False, deblocking=False,
                            intra_period=0, performance_mode=perf)
        ps = ParamSets.from_config(cfg)
        _, ry, ru, rv = encode_intra_frame(ps, y, u, v, 32, cu_size=16)
        d, *_ = encode_inter_frame_tree(ps, (y2, u, v), (ry, ru, rv), 32,
                                        search=16, avg_dist=1000)
        descs[int(perf)] = d
    assert (descs[0].cu_depth == 0).any(), "FULL should adopt some CU64"
    assert not (descs[2].cu_depth == 0).any(), "UFAST must skip CU64"


def test_num_b_gop_sync():
    cfg = EncoderConfig(num_b=1, gop_size=1)
    assert cfg.gop_size == 2
    cfg = EncoderConfig(gop_size=2)
    assert cfg.num_b == 1
    with pytest.raises(ValueError):
        EncoderConfig(num_b=3)
