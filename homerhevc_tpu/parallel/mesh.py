"""Multi-chip scale-out: frame/stream sharding over a jax.sharding.Mesh.

TPU-native replacement for the reference's frame-level "encoder engines"
(hmr_encoder_lib.c:3132, :1646-1648, SURVEY.md §2.6): instead of N threads
encoding N frames with semaphore handoffs, N devices each encode one frame
of a batch. All-intra frames are fully independent, so the only collectives
are the initial shard and the final gather; the host then serializes each
frame's CABAC payload into its own conformant stream — bit-exact to the
single-chip path because the device math is integer-exact and the
serializer is shared.

P-frame scale-out (design, implemented in `gop_parallel_encode`): each
device owns a GOP-aligned segment of the stream (segment = IDR..IDR-1), so
the inter reference chain never crosses a device boundary — the reference's
engine-to-engine ref-window handoff (hmr_encoder_lib.c:2440-2445) becomes
unnecessary by construction. For the non-GOP-aligned variant (one GOP split
across devices) the recon handoff would be a `jax.lax.ppermute` of the
filtered recon planes along the frame axis; that path trades a full-frame
ICI transfer per frame for pipeline depth and is only worth it when
segments are shorter than the per-device pipeline.
"""

from __future__ import annotations

import numpy as np


def make_mesh(n_devices: int):
    import jax
    from jax.sharding import Mesh
    devs = np.array(jax.devices()[:n_devices])
    return Mesh(devs, ("frame",))


def encode_frames_sharded(cfg, frames, mesh=None):
    """Frame-parallel all-intra encode over a device mesh.

    frames: list of (y, u, v) uint8 plane triples, one per device slot.
    Returns a list of standalone Annex-B-ready NAL lists (VPS/SPS/PPS + IDR
    slice per frame), bit-exact to the single-chip encoder.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from homerhevc_tpu.engine.intra_encoder import TpuIntraEncoder
    from homerhevc_tpu.engine.pipeline import EncoderPipeline

    if mesh is None:
        mesh = make_mesh(cfg.num_devices)
    n_dev = mesh.devices.size
    assert len(frames) % n_dev == 0, (
        f"frame batch ({len(frames)}) must fill the mesh ({n_dev})")

    proto = EncoderPipeline(cfg)   # handles CTU padding / conf window
    frames = [proto._pad_frame(*f) for f in frames]
    enc = TpuIntraEncoder(proto.ps, proto.cfg, cu=min(cfg.cu_size, 16))
    shard = NamedSharding(mesh, P("frame"))

    ys = jax.device_put(
        np.stack([np.asarray(f[0], np.uint8) for f in frames]), shard)
    us = jax.device_put(
        np.stack([np.asarray(f[1], np.uint8) for f in frames]), shard)
    vs = jax.device_put(
        np.stack([np.asarray(f[2], np.uint8) for f in frames]), shard)

    step = jax.jit(jax.vmap(enc._encode_frame_impl),
                   out_shardings=shard)
    out = step(ys, us, vs)
    # full-capacity values head (fetch_frames expects the dispatch-side
    # (vals_head, head) tail; sharded encode fetches everything at once)
    results = enc.fetch_frames((*out, out[7], enc.pack_C), len(frames))

    streams = []
    for (desc, ry, ru, rv), (y, u, v) in zip(results, frames):
        pipe = EncoderPipeline(cfg)
        ef = pipe._emit(desc, ry, ru, rv, src=(y, u, v), qp=cfg.qp)
        streams.append(ef.nals)
    return streams


def encode_frames_sharded_dryrun(n_devices: int) -> None:
    """Driver gate: full sharded encode of n_devices frames on an n-device
    mesh, checked bit-exact against the single-chip encode of each frame."""
    import jax

    from homerhevc_tpu.config import EncoderConfig
    from homerhevc_tpu.engine.pipeline import EncoderPipeline

    cfg = EncoderConfig(width=64, height=32, qp=32, gop_size=0, sao=False,
                        deblocking=False, sign_hiding=True, cu_size=16,
                        num_devices=n_devices)
    rng = np.random.RandomState(7)
    frames = [
        (rng.randint(0, 256, (32, 64), np.uint8),
         rng.randint(0, 256, (16, 32), np.uint8),
         rng.randint(0, 256, (16, 32), np.uint8))
        for _ in range(n_devices)
    ]
    streams = encode_frames_sharded(cfg, frames)
    assert len(streams) == n_devices
    # single-chip reference encode, same serializer: must be bit-exact
    for fr, nals in zip(frames, streams):
        pipe = EncoderPipeline(cfg)
        ref = list(pipe.push(*fr)) + list(pipe.flush())
        assert len(ref) == 1
        assert ref[0].nals == nals, "sharded stream != single-chip stream"
