"""Multi-chip scale-out: frame/stream sharding over a jax.sharding.Mesh.

TPU-native replacement for the reference's frame-level "encoder engines"
(hmr_encoder_lib.c:3132, :1646-1648, SURVEY.md §2.6): instead of N threads
encoding N frames with semaphore handoffs, N devices each encode one frame
of a batch. All-intra frames are fully independent, so the only collectives
are the initial shard and the final gather; the host then serializes each
frame's CABAC payload into its own conformant stream — bit-exact to the
single-chip path because the device math is integer-exact and the
serializer is shared.

P-frame scale-out (`gop_parallel_encode`): each device owns a GOP-aligned
segment of the stream (segment = IDR..IDR-1), so the inter reference chain
never crosses a device boundary — the reference's engine-to-engine
ref-window handoff (hmr_encoder_lib.c:2440-2445) becomes unnecessary by
construction. At every time step t the mesh encodes frame t of ALL
segments as one sharded vmapped device call; the per-segment recon chain
stays device-resident between steps (zero collectives — the segment axis
is fully data-parallel). For the non-GOP-aligned variant (one GOP split
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
    qps = jax.device_put(np.full(len(frames), cfg.qp, np.int32), shard)
    out = step(ys, us, vs, qps)
    results = enc.fetch_frames(out, len(frames))

    streams = []
    for (desc, ry, ru, rv), (y, u, v) in zip(results, frames):
        pipe = EncoderPipeline(cfg)
        ef = pipe._emit(desc, ry, ru, rv, src=(y, u, v), qp=cfg.qp)
        streams.append(ef.nals)
    return streams


def gop_parallel_encode(cfg, frames, mesh=None):
    """IPPP GOP-segment scale-out over a device mesh.

    frames: list of (y, u, v) triples, length = n_devices * seg_len.
    Segment d = frames[d*seg_len:(d+1)*seg_len], encoded IDR + (seg_len-1)
    P frames. Returns a list of per-segment NAL lists, each an independent
    conformant stream, bit-exact to the single-chip sequential encode of
    the same segment (tests/test_mesh.py).

    Step t encodes frame t of EVERY segment in one sharded vmapped device
    call; each segment's reference recon stays device-resident on its own
    shard between steps. The host serializes segment s's frame t-1 while
    the mesh computes frame t (the same depth-2 device/host overlap — and
    therefore the same avg_dist zero-forcing feedback lag — as the
    single-chip P pipeline, which is what makes the streams bit-exact).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from homerhevc_tpu.engine.inter_encoder import TpuInterEncoder
    from homerhevc_tpu.engine.intra_encoder import TpuIntraEncoder
    from homerhevc_tpu.engine.pipeline import EncoderPipeline
    from homerhevc_tpu.golden.inter_frame import zf_multiplier

    if mesh is None:
        mesh = make_mesh(cfg.num_devices)
    n_dev = mesh.devices.size
    assert len(frames) % n_dev == 0, "frames must fill the mesh evenly"
    seg_len = len(frames) // n_dev

    pipes = [EncoderPipeline(cfg) for _ in range(n_dev)]
    frames = [pipes[0]._pad_frame(*f) for f in frames]
    ps, cfg_p = pipes[0].ps, pipes[0].cfg
    shard = NamedSharding(mesh, P("frame"))

    def put(i):
        return tuple(jax.device_put(np.stack(
            [np.asarray(frames[d * seg_len + i][c], np.uint8)
             for d in range(n_dev)]), shard) for c in range(3))

    # ---- step 0: all segments' IDR frames (sharded intra wavefront) ----
    enc_i = TpuIntraEncoder(ps, cfg_p, cu=min(cfg.cu_size, 16))
    step_i = jax.jit(jax.vmap(enc_i._encode_frame_impl), out_shardings=shard)
    ys, us, vs = put(0)
    qps = jax.device_put(np.full(n_dev, cfg.qp, np.int32), shard)
    out_i = step_i(ys, us, vs, qps)
    res_i = enc_i.fetch_frames(out_i, n_dev)
    streams = [[] for _ in range(n_dev)]
    for d, (desc, ry, ru, rv) in enumerate(res_i):
        ef = pipes[d]._emit(desc, ry, ru, rv, src=frames[d * seg_len],
                            qp=cfg.qp)
        streams[d] = list(ef.nals)
    if seg_len == 1:
        return streams

    # ---- P chain: one sharded vmapped inter program per time step ----
    enc_p = TpuInterEncoder(ps, cfg_p, search=pipes[0]._inter_search_range())
    step_p = jax.jit(jax.vmap(enc_p._impl), out_shardings=shard)
    refs = (out_i[0], out_i[1], out_i[2])      # sharded recon planes
    pend = None                                 # (out, t) awaiting emit
    for t in range(1, seg_len):
        zf = jax.device_put(np.asarray(
            [zf_multiplier(pipes[d].avg_dist, cfg.qp)
             for d in range(n_dev)], np.float32), shard)
        ys, us, vs = put(t)
        out_p = step_p(ys, us, vs, *refs, zf, qps)
        refs = (out_p[0], out_p[1], out_p[2])
        if pend is not None:
            _emit_p_step(pipes, streams, frames, enc_p, pend, seg_len,
                         cfg.qp, n_dev)
        pend = (out_p, t)
    _emit_p_step(pipes, streams, frames, enc_p, pend, seg_len, cfg.qp,
                 n_dev)
    return streams


def _emit_p_step(pipes, streams, frames, enc_p, pend, seg_len, qp, n_dev):
    """Serialize frame `t` of every segment from a sharded inter output."""
    from homerhevc_tpu.hevc.headers import SLICE_P
    out_p, t = pend
    for d in range(n_dev):
        one = tuple(x[d] for x in out_p)
        desc, ry, ru, rv = enc_p.fetch(one)
        ef = pipes[d]._emit(desc, ry, ru, rv,
                            src=frames[d * seg_len + t],
                            slice_type=SLICE_P, qp=qp)
        streams[d].extend(ef.nals)


def encode_frames_sharded_dryrun(n_devices: int) -> None:
    """Driver gate: full sharded encode of n_devices frames on an n-device
    mesh, checked bit-exact against the single-chip encode of each frame;
    then a GOP-segment IPPP encode (1 segment per device, IDR + 2 P each)
    checked bit-exact against the single-chip sequential pipeline."""
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

    # ---- GOP-segment IPPP scale-out (P-frame multichip path) ----
    import dataclasses
    seg_len = 3
    cfg_p = dataclasses.replace(cfg, gop_size=1, deblocking=True,
                                reinit_gop_on_scene_change=False)
    base = frames[0]
    pframes = []
    for d in range(n_devices):
        for t in range(seg_len):
            # gentle per-frame drift so P frames have real motion/residual
            y = np.roll(base[0], d + t, axis=1)
            pframes.append((y, base[1], base[2]))
    segs = gop_parallel_encode(cfg_p, pframes)
    assert len(segs) == n_devices
    for d in range(n_devices):
        pipe = EncoderPipeline(cfg_p)
        ref_nals = []
        for t in range(seg_len):
            for ef in pipe.push(*pframes[d * seg_len + t]):
                ref_nals.extend(ef.nals)
        for ef in pipe.flush():
            ref_nals.extend(ef.nals)
        assert segs[d] == ref_nals, (
            f"gop-parallel segment {d} != single-chip sequential stream")
