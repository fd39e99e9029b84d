"""Multi-chip frame sharding: full encode on the virtual 8-device CPU mesh
(SURVEY.md §2.6 frame-level parallelism; reference engine scale-out
hmr_encoder_lib.c:1646-1648)."""

import numpy as np
import pytest

from homerhevc_tpu.config import EncoderConfig
from homerhevc_tpu.engine.pipeline import EncoderPipeline
from homerhevc_tpu.parallel.mesh import encode_frames_sharded, make_mesh

from conftest import make_yuv


def test_mesh_has_8_devices():
    import jax
    assert jax.device_count() >= 8


def test_sharded_encode_bit_exact_vs_single(rng):
    """8 frames -> 8 devices -> 8 streams, each bit-exact to the
    single-chip encoder's output for the same frame."""
    cfg = EncoderConfig(width=64, height=32, qp=32, gop_size=0, sao=False,
                        deblocking=False, sign_hiding=True, cu_size=16,
                        num_devices=8)
    frames = [make_yuv(rng, 64, 32) for _ in range(8)]
    streams = encode_frames_sharded(cfg, frames)
    assert len(streams) == 8
    for fr, nals in zip(frames, streams):
        pipe = EncoderPipeline(cfg)
        ref = list(pipe.push(*fr)) + list(pipe.flush())
        assert len(ref) == 1
        assert ref[0].nals == nals


def test_sharded_encode_decodes(tmp_path, rng):
    """Sharded streams are conformant: FFmpeg decodes each to the encoder's
    own reconstruction bit-exactly (the fundamental invariant)."""
    from conftest import decode_annexb
    from homerhevc_tpu.hevc.bitstream import annex_b

    cfg = EncoderConfig(width=64, height=32, qp=30, gop_size=0, sao=False,
                        deblocking=True, sign_hiding=True, cu_size=16,
                        num_devices=8)
    frames = [make_yuv(rng, 64, 32) for _ in range(8)]
    streams = encode_frames_sharded(cfg, frames)
    # recompute recon via the single-chip pipeline to compare
    for i, (fr, nals) in enumerate(zip(frames, streams)):
        p = tmp_path / f"s{i}.265"
        p.write_bytes(annex_b(nals))
        dec = decode_annexb(p)
        assert len(dec) == 1
        pipe = EncoderPipeline(cfg)
        ef = (list(pipe.push(*fr)) + list(pipe.flush()))[0]
        assert np.array_equal(dec[0], ef.recon["y"])


def test_dryrun_entrypoint():
    """The driver's gate function runs green on the virtual mesh."""
    from homerhevc_tpu.parallel.mesh import encode_frames_sharded_dryrun
    encode_frames_sharded_dryrun(8)
