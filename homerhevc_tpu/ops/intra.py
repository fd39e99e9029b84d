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


@lru_cache(maxsize=None)
def _mode_tables(n: int, is_luma: bool):
    """Static per-mode lookup tables for predict_mode: (uses_filtered[35],
    angle[35], inv_angle[35])."""
    uses = np.zeros(35, bool)
    ang = np.zeros(35, np.int32)
    inv = np.zeros(35, np.int32)
    for m in range(35):
        uses[m] = mode_uses_filtered(m, n, is_luma)
        if m >= 2:
            ang[m] = int(PRED_ANGLE[m - 2])
        if 11 <= m <= 25:
            inv[m] = int(INV_ANGLE[m - 11])
    return uses, ang, inv


def predict_mode(top_u, left_u, n: int, mode, is_luma: bool):
    """Single-mode batched intra prediction with a TRACED per-block mode.

    top_u/left_u: (B, 2n+1) int32 corner-first refs; mode: (B,) int32.
    Returns (B, n, n) int32, bit-exact to golden ip.predict (incl. the
    [1 2 1] filter rule, DC edge smoothing and mode 10/26 gradient fixes).
    Used by the tree encode wavefront where the mode is already decided —
    one prediction instead of 35 inside the sequential scan."""
    B = top_u.shape[0]
    mode = mode.astype(jnp.int32)
    uses_t, ang_t, inv_t = _mode_tables(n, is_luma)
    use_f = jnp.asarray(uses_t)[mode]
    top_f, left_f = filter_refs(top_u, left_u)
    top = jnp.where(use_f[:, None], top_f, top_u)
    left = jnp.where(use_f[:, None], left_f, left_u)
    log2n = n.bit_length() - 1
    x = jnp.arange(n)
    y = jnp.arange(n)

    # ---- planar (spec 8.4.4.2.4) — filtered refs per the distance rule
    t_row = top[:, 1:n + 1]
    l_col = left[:, 1:n + 1]
    tr = top[:, n + 1]
    bl = left[:, n + 1]
    planar = ((n - 1 - x)[None, None, :] * l_col[:, :, None]
              + (x + 1)[None, None, :] * tr[:, None, None]
              + (n - 1 - y)[None, :, None] * t_row[:, None, :]
              + (y + 1)[None, :, None] * bl[:, None, None]
              + n) >> (log2n + 1)

    # ---- DC (unfiltered refs always)
    tu = top_u[:, 1:n + 1]
    lu = left_u[:, 1:n + 1]
    dc = (jnp.sum(tu, axis=1) + jnp.sum(lu, axis=1) + n) >> (log2n + 1)
    dcp = jnp.broadcast_to(dc[:, None, None], (B, n, n))
    if is_luma and n < 32:
        row0 = (tu + 3 * dc[:, None] + 2) >> 2
        col0 = (lu + 3 * dc[:, None] + 2) >> 2
        c00 = (lu[:, 0] + 2 * dc + tu[:, 0] + 2) >> 2
        dcp = dcp.at[:, 0, :].set(row0)
        dcp = dcp.at[:, :, 0].set(col0)
        dcp = dcp.at[:, 0, 0].set(c00)

    # ---- angular (spec 8.4.4.2.6), both orientations via main/side swap
    angle = jnp.asarray(ang_t)[mode]                    # (B,)
    inv = jnp.asarray(inv_t)[mode]
    vertical = mode >= 18
    main = jnp.where(vertical[:, None], top, left)      # (B, 2n+1)
    side = jnp.where(vertical[:, None], left, top)
    # extended ref ext[k+n] for k in [-n, 2n]
    kk_neg = jnp.arange(-n, 0)                          # (n,)
    j = (kk_neg[None, :] * inv[:, None] + 128) >> 8     # (B, n)
    ext_neg = jnp.take_along_axis(side, jnp.clip(j, 0, 2 * n), axis=1)
    ext = jnp.concatenate([ext_neg, main], axis=1)      # (B, 3n+1)
    pos = (y + 1)[None, :] * angle[:, None]             # (B, n) per main row
    i_idx = pos >> 5
    frac = pos & 31
    base = n + 1 + i_idx[:, :, None] + x[None, None, :]  # (B, n, n)
    bidx = base.reshape(B, n * n)
    a = jnp.take_along_axis(ext, jnp.clip(bidx, 0, 3 * n), axis=1)
    b = jnp.take_along_axis(ext, jnp.clip(bidx + 1, 0, 3 * n), axis=1)
    a = a.reshape(B, n, n)
    b = b.reshape(B, n, n)
    pr = ((32 - frac[:, :, None]) * a + frac[:, :, None] * b + 16) >> 5
    angp = jnp.where(vertical[:, None, None], pr,
                     jnp.swapaxes(pr, 1, 2))
    if is_luma and n < 32:
        # mode 26 (vertical) first-column / mode 10 first-row gradient fix
        corner = top_u[:, 0]
        v26 = jnp.clip(tu[:, 0:1] + ((lu - corner[:, None]) >> 1), 0, 255)
        h10 = jnp.clip(lu[:, 0:1] + ((tu - corner[:, None]) >> 1), 0, 255)
        is26 = (mode == 26)[:, None]
        is10 = (mode == 10)[:, None]
        angp = angp.at[:, :, 0].set(
            jnp.where(is26, v26, angp[:, :, 0]))
        angp = angp.at[:, 0, :].set(
            jnp.where(is10, h10, angp[:, 0, :]))
    out = jnp.where((mode == 0)[:, None, None], planar,
                    jnp.where((mode == 1)[:, None, None], dcp, angp))
    return out.astype(jnp.int32)


def avail_masks(w: int, h: int, ctu: int, n: int, comp_shift: int,
                xs0: np.ndarray, ys0: np.ndarray) -> np.ndarray:
    """Vectorized z-scan availability (spec 6.4.1) for the substitution
    sequence [left bottom..top (2n), corner, top (2n)] of blocks whose
    component-space top-left corners are xs0/ys0 (broadcastable arrays).
    Coordinates are in component space; availability is evaluated in luma
    space (<< comp_shift). Returns bool array xs0.shape + (4n+1,).
    Static (numpy) — precomputed per geometry."""
    from homerhevc_tpu.golden.intra_pred import _zorder_table
    cs = comp_shift
    n2 = 2 * n
    offx = np.concatenate([np.full(n2, -1),            # left col
                           [-1],                        # corner
                           np.arange(n2)])              # top row
    offy = np.concatenate([n2 - 1 - np.arange(n2),      # bottom..top
                           [-1],
                           np.full(n2 + 1 - 1, -1)])
    xs0 = np.asarray(xs0)[..., None]
    ys0 = np.asarray(ys0)[..., None]
    xn = (xs0 + offx) << cs
    yn = (ys0 + offy) << cs
    xc, yc = xs0 << cs, ys0 << cs
    inside = (xn >= 0) & (yn >= 0) & (xn < w) & (yn < h)
    ctus_x = -(-w // ctu)
    ctu_c = (yc // ctu) * ctus_x + xc // ctu
    ctu_n = (yn // ctu) * ctus_x + xn // ctu
    z = _zorder_table(ctu.bit_length() - 1, 2)
    zc = z[(yc % ctu) // 4, (xc % ctu) // 4]
    zn = z[(np.clip(yn, 0, None) % ctu) // 4,
           (np.clip(xn, 0, None) % ctu) // 4]
    return inside & ((ctu_n < ctu_c) | ((ctu_n == ctu_c) & (zn < zc)))


def gather_ref_seq(plane: jnp.ndarray, n: int) -> jnp.ndarray:
    """(gh, gw, 4n+1) substitution-order raw reference samples for every
    aligned n-block of `plane` (pre availability mask)."""
    hh, ww = plane.shape
    n2 = 2 * n
    pp = jnp.pad(plane.astype(jnp.int32), ((1, n2), (1, n2)))
    gys = jnp.arange(hh // n) * n
    gxs = jnp.arange(ww // n) * n
    lall = pp[:, gxs]                                   # (hh+n2+1, gw)
    jidx = jnp.arange(n2)
    rows = gys[:, None] + (n2 - jidx)[None, :]          # (gh, n2)
    seq_left = lall[rows].transpose(0, 2, 1)            # (gh, gw, n2)
    corner = pp[gys][:, gxs]                            # (gh, gw)
    tall = pp[gys, :]                                   # (gh, ww+n2+1)
    cols = gxs[:, None] + 1 + jidx[None, :]             # (gw, n2)
    seq_top = tall[:, cols]                             # (gh, gw, n2)
    return jnp.concatenate(
        [seq_left, corner[..., None], seq_top], axis=-1)


def seq_to_refs(seq: jnp.ndarray, n: int):
    """Substitution-order (B, 4n+1) -> corner-first (top, left) (B, 2n+1)."""
    n2 = 2 * n
    left = seq[:, :n2][:, ::-1]
    corner = seq[:, n2:n2 + 1]
    top = seq[:, n2 + 1:]
    return (jnp.concatenate([corner, top], axis=1),
            jnp.concatenate([corner, left], axis=1))


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
