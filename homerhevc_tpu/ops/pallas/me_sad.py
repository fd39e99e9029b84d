"""Pallas TPU kernel: fused multi-offset block-SAD sweep for the coarse
level of the hierarchical motion search.

The XLA formulation in `engine/inter_encoder._hier_me` unrolls one
shifted-plane abs-diff + block-reduce per offset — (2R+1)^2 separate
fused loops over the decimated planes, each re-streaming both planes.
This kernel makes the sweep a single pass: both decimated planes are
staged in VMEM once (the 2x-decimated 720p pair is ~0.6 MB, far under
the ~16 MB VMEM budget) and a grid over block-rows loops all offsets
in-register.

Arithmetic is identical to the unrolled form (integer abs-diff block
sums), so results are bit-exact and the golden-twin tests hold
unchanged. Reference analog: the full-pel SAD loops of
hmr_motion_estimation (hmr_motion_inter.c:1404) / sse_aligned_sad_*
(hmr_sse42_functions_pixel.c).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False


def _sweep_kernel(src_ref, ref_ref, blkmat_ref, out_ref, *, R: int, m: int,
                  gw: int):
    """One grid step = (one block-row of the source) x (one dy offset).

    src_ref:    (gh*m, gw*m) int16 — whole decimated source (VMEM)
    ref_ref:    (gh*m + 2R, gw*m + 2R) int16 — padded decimated ref (VMEM)
    blkmat_ref: (gw*m, gw) f32 block-indicator matrix (VMEM)
    out_ref:    (1, 1, pad8(side), gw) int32 — SADs of every dx at this
                (block-row, dy)

    Lowering constraints shape this kernel: vector loads need 8-aligned
    dynamic sublane starts (VMEM is (8, 128)-tiled, and DMA sources share
    the constraint since HBM buffers are tiled too), so the dynamic dy
    offset is applied as a dynamic sublane ROTATE (pltpu.roll — a
    supported vector op) of an aligned superband load, with dy riding
    the grid; only the dx sweep is unrolled as static lane slices. The
    per-block lane reduction is a matmul with a 0/1 indicator
    (lane-splitting reshapes don't lower in Mosaic; the MXU does the
    segmented sum). Column SADs fit fp32 exactly (<= 255 * m * m <<
    2^24), so results are bit-exact with the unrolled-XLA oracle."""
    side = 2 * R + 1
    pad8 = -(-side // 8) * 8
    w = gw * m
    i = pl.program_id(0)
    dy = pl.program_id(1)
    base = i * m
    src = src_ref[pl.ds(base, m), :].astype(jnp.int32)
    blkmat = blkmat_ref[:, :]
    big = ref_ref[pl.ds(base, m + 2 * R), :].astype(jnp.int32)
    rows = pltpu.roll(big, -dy, 0)[:m, :]
    cs = [jnp.abs(src - rows[:, dx:dx + w]).sum(axis=0, keepdims=True)
          for dx in range(side)]                         # side x (1, w)
    cs += [jnp.zeros((1, w), jnp.int32)] * (pad8 - side)
    c = jnp.concatenate(cs, axis=0).astype(jnp.float32)
    out_ref[0, 0, :, :] = jnp.dot(
        c, blkmat, preferred_element_type=jnp.float32).astype(jnp.int32)


def coarse_sweep_sads(sd: jnp.ndarray, ref_pad: jnp.ndarray, R: int,
                      m: int, interpret: bool = False) -> jnp.ndarray:
    """(side^2, gh, gw) block SADs of the decimated source vs every
    (dy, dx) in [-R, R]^2 of the edge-padded decimated reference.

    sd:      (gh*m, gw*m) decimated source
    ref_pad: (gh*m + 2R, gw*m + 2R) decimated reference, edge-padded by R
    """
    assert _HAVE_PALLAS
    # the superband load is provably aligned only when m and 2R are
    # sublane multiples (production m = cu/2 in {8, 16}, R in {16, 24})
    assert m % 8 == 0 and (2 * R) % 8 == 0, (m, R)
    gh = sd.shape[0] // m
    gw = sd.shape[1] // m
    side = 2 * R + 1
    kern = partial(_sweep_kernel, R=R, m=m, gw=gw)
    w = gw * m
    pad8 = -(-side // 8) * 8
    blkmat = (jnp.arange(w)[:, None] // m
              == jnp.arange(gw)[None, :]).astype(jnp.float32)
    out = pl.pallas_call(
        kern,
        grid=(gh, side),
        in_specs=[
            pl.BlockSpec(sd.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(ref_pad.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, gw), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, pad8, gw), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((gh, side, pad8, gw), jnp.int32),
        interpret=interpret,
    )(sd.astype(jnp.int16), ref_pad.astype(jnp.int16), blkmat)
    # (gh, side, pad8, gw) -> (side*side, gh, gw)
    return out[:, :, :side, :].reshape(gh, side * side, gw) \
        .transpose(1, 0, 2)


_PROBE_OK = None


def pallas_ok() -> bool:
    """One-shot probe: compile + run a tiny sweep on the default backend
    and compare against the XLA oracle. Gates the kernel's use so an
    unsupported platform (or a miscompiling lowering) falls back to the
    unrolled formulation instead of corrupting the bitstream."""
    global _PROBE_OK
    if _PROBE_OK is not None:
        return _PROBE_OK
    if not _HAVE_PALLAS:
        _PROBE_OK = False
        return False
    try:
        m, gh, gw, R = 8, 2, 2, 8
        sd = (np.arange(gh * m * gw * m, dtype=np.int64) * 7919 % 251) \
            .reshape(gh * m, gw * m).astype(np.int16)
        ref = ((np.arange(gh * m * gw * m, dtype=np.int64) * 104729 + 3)
               % 251).reshape(gh * m, gw * m)
        rp = np.pad(ref, R, mode="edge").astype(np.int16)
        a = np.asarray(coarse_sweep_sads(jnp.asarray(sd), jnp.asarray(rp),
                                         R, m))
        b = np.asarray(coarse_sweep_sads_ref(jnp.asarray(sd),
                                             jnp.asarray(rp), R, m))
        _PROBE_OK = bool(np.array_equal(a, b))
    except Exception:
        _PROBE_OK = False
    return _PROBE_OK


def coarse_sweep_sads_ref(sd, ref_pad, R, m):
    """Unrolled-XLA twin of coarse_sweep_sads (the original formulation);
    kept as the oracle + fallback."""
    gh = sd.shape[0] // m
    gw = sd.shape[1] // m
    side = 2 * R + 1
    outs = []
    for k in range(side * side):
        dy, dx = k // side - R, k % side - R
        sh = ref_pad[R + dy:R + dy + gh * m, R + dx:R + dx + gw * m]
        d = jnp.abs(sd.astype(jnp.int32) - sh.astype(jnp.int32))
        outs.append(d.reshape(gh, m, gw, m).sum(axis=(1, 3)))
    return jnp.stack(outs)
