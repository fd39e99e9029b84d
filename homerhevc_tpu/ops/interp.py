"""Device (JAX) batched MC interpolation: per-CU fractional filters via
coefficient gathers (no 15-plane prefiltering needed).

Bit-exact to golden/interp.py (unified two-pass formulation — the golden
integer/frac special cases are algebraically identical to the generic
filter with the identity tap set).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from homerhevc_tpu.golden.interp import CHROMA_FILT, LUMA_FILT

LUMA_TAPS = np.asarray([LUMA_FILT[f] for f in range(4)], np.int32)     # (4,8)
CHROMA_TAPS = np.asarray([CHROMA_FILT[f] for f in range(8)], np.int32)  # (8,4)


def _windowed(x, k, axis):
    """Stack k sliding slices along a new last axis."""
    slices = []
    n = x.shape[axis] - k + 1
    for i in range(k):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(i, i + n)
        slices.append(x[tuple(idx)])
    return jnp.stack(slices, axis=-1)


def extract_patches(pad_plane: jnp.ndarray, by: jnp.ndarray,
                    bx: jnp.ndarray, n: int) -> jnp.ndarray:
    """(B, n, n) patches at per-block starts (by, bx) — vmapped
    dynamic_slice, which lowers to a sliced gather that measures ~2.3x
    faster on TPU than the per-element advanced-indexing gather
    (58 -> 25 ms for 2040x40x40 at 1080p). Starts must be in-range
    (dynamic_slice clamps; callers keep them in-range by construction,
    exactly as the advanced-indexing form required)."""
    f = lambda yy, xx: jax.lax.dynamic_slice(pad_plane, (yy, xx), (n, n))
    return jax.vmap(f)(by, bx)


def mc_luma_batch(ref_pad: jnp.ndarray, pad: int, x0s: jnp.ndarray,
                  y0s: jnp.ndarray, n: int, mvs: jnp.ndarray) -> jnp.ndarray:
    """Batched luma MC: ref_pad is the reference edge-padded by `pad`;
    x0s/y0s (B,) block origins (unpadded coords); mvs (B,2) quarter-pel.
    Returns (B, n, n) int32 pixels."""
    mvx, mvy = mvs[:, 0], mvs[:, 1]
    ix, iy = mvx >> 2, mvy >> 2
    fx, fy = mvx & 3, mvy & 3
    by = y0s + iy + pad - 3
    bx = x0s + ix + pad - 3
    patch = extract_patches(ref_pad, by, bx, n + 7).astype(jnp.int32)
    fxt = jnp.asarray(LUMA_TAPS)[fx]                    # (B, 8)
    fyt = jnp.asarray(LUMA_TAPS)[fy]
    wx = _windowed(patch, 8, axis=2)                    # (B, n+7, n, 8)
    h = jnp.einsum("bk,byxk->byx", fxt, wx)             # scale 64
    wy = _windowed(h, 8, axis=1)                        # (B, n, n, 8)
    v = jnp.einsum("bk,byxk->byx", fyt, wy) >> 6        # scale 64
    return jnp.clip((v + 32) >> 6, 0, 255)


def luma_phase_planes(ref_pad: jnp.ndarray) -> jnp.ndarray:
    """All 16 quarter-pel interpolated planes of an edge-padded reference.

    Separable full-plane filtering (two shifted-add passes) instead of
    per-block halo gathers: XLA vectorizes plane shifts natively, so the
    per-candidate MC in motion refinement reduces to a (B, n, n) uint8
    gather from the right phase plane. Bit-exact to mc_luma_batch.
    Returns (16, Hp-7, Wp-7) uint8, phase index = fy*4+fx."""
    P = ref_pad.astype(jnp.int32)
    Hp, Wp = P.shape
    taps = jnp.asarray(LUMA_TAPS)                       # (4, 8)
    # horizontal pass: h[fx][y, x] = sum_k taps[fx,k] * P[y, x+k]
    wx = _windowed(P, 8, axis=1)                        # (Hp, Wp-7, 8)
    h = jnp.einsum("fk,yxk->fyx", taps, wx)             # (4, Hp, Wp-7)
    wy = _windowed(h, 8, axis=1)                        # (4, Hp-7, Wp-7, 8)
    v = jnp.einsum("gk,fyxk->gfyx", taps, wy) >> 6      # (4, 4, ...)
    out = jnp.clip((v + 32) >> 6, 0, 255).astype(jnp.uint8)
    return out.reshape(16, Hp - 7, Wp - 7)


def mc_luma_batch_planes(planes: jnp.ndarray, pad: int, x0s: jnp.ndarray,
                         y0s: jnp.ndarray, n: int,
                         mvs: jnp.ndarray) -> jnp.ndarray:
    """Batched luma MC sampling from precomputed phase planes
    (luma_phase_planes of the same padded reference). Identical output to
    mc_luma_batch(ref_pad, pad, ...)."""
    mvx, mvy = mvs[:, 0], mvs[:, 1]
    ix, iy = mvx >> 2, mvy >> 2
    p = (mvy & 3) * 4 + (mvx & 3)
    by = y0s + iy + pad - 3
    bx = x0s + ix + pad - 3
    rows = by[:, None, None] + jnp.arange(n)[None, :, None]
    cols = bx[:, None, None] + jnp.arange(n)[None, None, :]
    return planes[p[:, None, None], rows, cols].astype(jnp.int32)


def mc_chroma_batch(ref_pad: jnp.ndarray, pad: int, x0s: jnp.ndarray,
                    y0s: jnp.ndarray, n: int, mvs: jnp.ndarray) -> jnp.ndarray:
    """Batched chroma MC: mvs are the LUMA quarter-pel MVs (chroma
    eighth-pel). Block origins in chroma coords."""
    mvx, mvy = mvs[:, 0], mvs[:, 1]
    ix, iy = mvx >> 3, mvy >> 3
    fx, fy = mvx & 7, mvy & 7
    by = y0s + iy + pad - 1
    bx = x0s + ix + pad - 1
    patch = extract_patches(ref_pad, by, bx, n + 3).astype(jnp.int32)
    fxt = jnp.asarray(CHROMA_TAPS)[fx]
    fyt = jnp.asarray(CHROMA_TAPS)[fy]
    wx = _windowed(patch, 4, axis=2)
    h = jnp.einsum("bk,byxk->byx", fxt, wx)
    wy = _windowed(h, 4, axis=1)
    v = jnp.einsum("bk,byxk->byx", fyt, wy) >> 6
    return jnp.clip((v + 32) >> 6, 0, 255)


def mc_chroma_batch_14(ref_pad: jnp.ndarray, pad: int, x0s: jnp.ndarray,
                       y0s: jnp.ndarray, n: int,
                       mvs: jnp.ndarray) -> jnp.ndarray:
    """14-bit intermediate chroma MC (bi-prediction input; golden twin
    mc_chroma_14): the un-rounded filter output."""
    mvx, mvy = mvs[:, 0], mvs[:, 1]
    ix, iy = mvx >> 3, mvy >> 3
    fx, fy = mvx & 7, mvy & 7
    by = y0s + iy + pad - 1
    bx = x0s + ix + pad - 1
    patch = extract_patches(ref_pad, by, bx, n + 3).astype(jnp.int32)
    fxt = jnp.asarray(CHROMA_TAPS)[fx]
    fyt = jnp.asarray(CHROMA_TAPS)[fy]
    wx = _windowed(patch, 4, axis=2)
    h = jnp.einsum("bk,byxk->byx", fxt, wx)
    wy = _windowed(h, 4, axis=1)
    return jnp.einsum("bk,byxk->byx", fyt, wy) >> 6
