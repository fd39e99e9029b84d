"""Multi-chip scale-out: frame/stream sharding over a jax.sharding.Mesh.

TPU-native replacement for the reference's frame-level "encoder engines"
(hmr_encoder_lib.c:3132, SURVEY.md §2.6): instead of N threads encoding N
frames with semaphore handoffs, N devices each encode a frame (or stream)
of a batch; all-intra frames are fully independent, so the only collective
is the initial shard + final gather. P-frame reference handoff between
devices (collective-permute of recon rows) arrives with the inter path.
"""

from __future__ import annotations

import numpy as np


def make_mesh(n_devices: int):
    import jax
    from jax.sharding import Mesh
    devs = np.array(jax.devices()[:n_devices])
    return Mesh(devs, ("frame",))


def frame_parallel_dryrun(n_devices: int) -> None:
    """Build an n-device mesh, jit one batched wavefront step with the frame
    axis sharded across devices, run it on tiny shapes."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from homerhevc_tpu.config import EncoderConfig
    from homerhevc_tpu.engine.intra_encoder import TpuIntraEncoder
    from homerhevc_tpu.hevc.headers import ParamSets

    mesh = make_mesh(n_devices)
    cfg = EncoderConfig(width=64, height=32, qp=32, gop_size=0, sao=False,
                        deblocking=False, sign_hiding=True, cu_size=16)
    ps = ParamSets.from_config(cfg)
    enc = TpuIntraEncoder(ps, cfg, cu=16)
    d = enc.ndiag // 2
    gxs, gys, valid = enc.gxs[d], enc.gys[d], enc.valid[d]
    cu, cuc = enc.cu, enc.cu // 2
    b = len(gxs)
    F = n_devices  # one in-flight frame per device

    inputs = {
        "gxs": jnp.asarray(gxs), "gys": jnp.asarray(gys),
        "valid": jnp.asarray(valid),
        "mask_y": jnp.asarray(enc.mask_y[gys, gxs] & valid[:, None]),
        "mask_c": jnp.asarray(enc.mask_c[gys, gxs] & valid[:, None]),
        "above_ok": jnp.asarray(enc.above_ok[gys, gxs]),
    }

    def step_one(recon_y, recon_u, recon_v, mode_grid, sy, su, sv):
        return enc._step_impl(inputs, recon_y, recon_u, recon_v, mode_grid,
                              sy, su, sv)

    step_frames = jax.vmap(step_one)
    shard = NamedSharding(mesh, P("frame"))

    def dev(x):
        return jax.device_put(x, shard)

    args = (
        dev(jnp.zeros((F, cfg.height, cfg.width), jnp.int32)),
        dev(jnp.zeros((F, cfg.height // 2, cfg.width // 2), jnp.int32)),
        dev(jnp.zeros((F, cfg.height // 2, cfg.width // 2), jnp.int32)),
        dev(jnp.ones((F, enc.gh, enc.gw), jnp.int32)),
        dev(jnp.zeros((F, b, cu, cu), jnp.int32)),
        dev(jnp.zeros((F, b, cuc, cuc), jnp.int32)),
        dev(jnp.zeros((F, b, cuc, cuc), jnp.int32)),
    )
    out = jax.jit(step_frames)(*args)
    jax.block_until_ready(out)
    assert out[0].shape == (F, cfg.height, cfg.width)
