"""Batched intra prediction (JAX): reference construction with z-scan
availability/substitution, smoothing filter, and all 35 modes as one
integer matmul against an augmented reference vector.

Bit-exact to golden/intra_pred.py. The 35-mode prediction weight tensor is
precomputed per block size; angular extension/filter selection is folded in,
so per-CU work is one (35, n*n, R) x (R,) integer contraction — batched over
all CUs of a wavefront diagonal.

Parity: reference hmr_sse42_functions_prediction.c (planar :126, angular
:131, ADI filter :86) — re-designed as linear operators instead of
per-mode SIMD loops.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from homerhevc_tpu.golden.intra_pred import INV_ANGLE, PRED_ANGLE

# modes that use the filtered reference per size (HM m_aucIntraFilter rule)
_FILTER_THRESH = {4: 10, 8: 7, 16: 1, 32: 0}


def mode_uses_filtered(mode: int, size: int, is_luma: bool) -> bool:
    if not is_luma or mode == 1 or size not in _FILTER_THRESH:
        return False
    dist = min(abs(mode - 26), abs(mode - 10)) if mode != 0 else 10
    return dist > _FILTER_THRESH[size]


@lru_cache(maxsize=None)
def pred_weights(n: int, is_luma: bool):
    """Build (W, S): W int32 [35, n*n, R], S int32 [35] with
    pred[m] = (W[m] @ ref_aug) >> S[m], where
    ref_aug = concat(top_u[2n+1], left_u[2n+1], top_f[2n+1], left_f[2n+1], [1])
    (u=unfiltered, f=filtered; layout [corner, samples...]).

    DC edge filtering and mode 10/26 gradient fixes are NOT in W (they nest
    floors); they are applied by `edge_fixes` afterwards.
    """
    reflen = 2 * n + 1
    R = 4 * reflen + 1
    W = np.zeros((35, n * n, R), np.int32)
    S = np.zeros(35, np.int32)
    log2n = n.bit_length() - 1

    def base(filtered: bool, which: str) -> int:
        # offset of [corner, ...] array in ref_aug
        o = 2 * reflen if filtered else 0
        return o + (0 if which == "top" else reflen)

    for mode in range(35):
        filt = mode_uses_filtered(mode, n, is_luma)
        tb = base(filt, "top")
        lb = base(filt, "left")
        const = R - 1
        if mode == 0:  # planar, shift log2n+1
            S[mode] = log2n + 1
            for y in range(n):
                for x in range(n):
                    p = y * n + x
                    W[mode, p, lb + 1 + y] += (n - 1 - x)
                    W[mode, p, tb + 1 + n] += (x + 1)      # top-right p[N][-1]
                    W[mode, p, tb + 1 + x] += (n - 1 - y)
                    W[mode, p, lb + 1 + n] += (y + 1)      # bottom-left
                    W[mode, p, const] += n
        elif mode == 1:  # DC (never filtered refs)
            S[mode] = log2n + 1
            tu, lu = base(False, "top"), base(False, "left")
            for p in range(n * n):
                for i in range(n):
                    W[mode, p, tu + 1 + i] += 1
                    W[mode, p, lu + 1 + i] += 1
                W[mode, p, const] += n
        else:  # angular
            S[mode] = 5
            angle = int(PRED_ANGLE[mode - 2])
            vertical = mode >= 18
            mb = tb if vertical else lb
            sb = lb if vertical else tb
            # extended ref index -> (array_base, offset) mapping
            def ref_entry(k: int):
                """spec ref[k]: k>=0 -> main[k] (corner at k=0);
                k<0 -> side[(k*inv+128)>>8] (projected)."""
                if k >= 0:
                    return mb + k
                inv = int(INV_ANGLE[mode - 11])
                j = (k * inv + 128) >> 8
                return sb + j
            for y in range(n):
                for x in range(n):
                    row, col = (y, x) if vertical else (x, y)
                    pos = (row + 1) * angle
                    i_idx = pos >> 5
                    f = pos & 31
                    p = y * n + x if vertical else x * n + y
                    # pred[main_coord=row, other=col]
                    pp = row * n + col if vertical else col * n + row
                    k = col + i_idx + 1
                    W[mode, pp, ref_entry(k)] += 32 - f
                    if f:
                        W[mode, pp, ref_entry(k + 1)] += f
                    W[mode, pp, const] += 16
            if not vertical:
                # transpose pred grid: swap was handled via pp indexing above
                pass
    # return numpy (cached): jnp arrays created inside a jit trace would
    # leak tracers through the lru_cache
    return W, S


def filter_refs(top: jnp.ndarray, left: jnp.ndarray):
    """[1 2 1] filter of (B, 2n+1) ref arrays (corner-first layout).
    Returns (top_f, left_f); endpoints unfiltered; corner joint-filtered."""
    n2 = top.shape[-1] - 1  # = 2n
    corner = (left[..., 1] + 2 * top[..., 0] + top[..., 1] + 2) >> 2

    def f(arr):
        # filtered positions 1..2n-1 (mid[k] corresponds to arr index k+1)
        mid = (arr[..., :-2] + 2 * arr[..., 1:-1] + arr[..., 2:] + 2) >> 2
        return jnp.concatenate(
            [corner[..., None], mid, arr[..., -1:]], axis=-1)
    return f(top), f(left)


def predict_all_modes(top_u, left_u, n: int, is_luma: bool):
    """(B, 2n+1) int32 refs -> (B, 35, n, n) int32 predictions (pre edge-fix).
    """
    top_f, left_f = filter_refs(top_u, left_u)
    ones = jnp.ones(top_u.shape[:-1] + (1,), jnp.int32)
    ref_aug = jnp.concatenate([top_u, left_u, top_f, left_f, ones], axis=-1)
    W, S = pred_weights(n, is_luma)
    # run the contraction on the MXU in f32: |W| <= 64, refs <= 255, sums
    # bounded by ~2^15 (planar/DC worst case) -- exactly representable
    raw_f = jnp.einsum("mpr,br->bmp",
                       jnp.asarray(W, jnp.float32),
                       ref_aug.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
    raw = raw_f.astype(jnp.int32)
    pred = raw >> jnp.asarray(S)[None, :, None]
    return pred.reshape(ref_aug.shape[0], 35, n, n)


def edge_fixes(pred: jnp.ndarray, top_u, left_u, n: int, is_luma: bool):
    """Apply DC edge smoothing and mode 10/26 gradient fixes (luma, n<32).
    pred: (B, 35, n, n)."""
    if not is_luma or n >= 32:
        return pred
    t = top_u[..., 1:n + 1]
    l = left_u[..., 1:n + 1]
    corner = top_u[..., 0]
    # DC (mode 1)
    dc = pred[:, 1, n - 1, n - 1]  # interior value = dc
    row0 = (t + 3 * dc[..., None] + 2) >> 2
    col0 = (l + 3 * dc[..., None] + 2) >> 2
    c00 = (l[..., 0] + 2 * dc + t[..., 0] + 2) >> 2
    dcp = pred[:, 1]
    dcp = dcp.at[:, 0, :].set(row0)
    dcp = dcp.at[:, :, 0].set(col0)
    dcp = dcp.at[:, 0, 0].set(c00)
    pred = pred.at[:, 1].set(dcp)
    # mode 26 (vertical): first column
    v26 = jnp.clip(t[..., 0:1] + ((l - corner[..., None]) >> 1), 0, 255)
    pred = pred.at[:, 26, :, 0].set(v26)
    # mode 10 (horizontal): first row
    h10 = jnp.clip(l[..., 0:1] + ((t - corner[..., None]) >> 1), 0, 255)
    pred = pred.at[:, 10, 0, :].set(h10)
    return pred


def substitute_refs(vals: jnp.ndarray, avail: jnp.ndarray):
    """Reference sample substitution (spec 8.4.4.2.2), batched.

    vals: (B, L) int32 gathered samples in substitution scan order
          [left bottom..top, corner, top left..right]
    avail: (B, L) bool availability.
    Returns substituted vals; rows with nothing available become 128.
    """
    L = vals.shape[-1]
    idx = jnp.arange(L)
    # index of most recent available position at-or-before i
    marked = jnp.where(avail, idx, -1)
    last_ok = jax.lax.associative_scan(jnp.maximum, marked, axis=-1)
    # position 0 unavailable: take first available overall
    first_ok = jnp.argmax(avail, axis=-1)
    src = jnp.where(last_ok >= 0, last_ok, first_ok[..., None])
    out = jnp.take_along_axis(vals, src, axis=-1)
    any_ok = jnp.any(avail, axis=-1, keepdims=True)
    return jnp.where(any_ok, out, 128)
