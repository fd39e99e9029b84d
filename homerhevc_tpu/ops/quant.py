"""Batched quantization / dequantization + vectorized sign-bit hiding (JAX).

Bit-exact to golden/quantize.py. int32 throughout with saturation tricks in
place of int64 (TPU has no fast 64-bit integer path).

Parity: reference hmr_sse42_functions_quant.c / hmr_quant.c:61-258.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from homerhevc_tpu.hevc import tables as T


def quant_params(size: int, qp: int, is_intra: bool, scaling_lists: bool):
    """Static per-call tables: (qc[size,size], qbits, add) for forward."""
    log2n = size.bit_length() - 1
    per, rem = qp // 6, qp % 6
    tshift = T.MAX_TR_DYNAMIC_RANGE - 8 - log2n
    qbits = T.QUANT_SHIFT + per + tshift
    sl = T.scaling_list(size, is_intra, flat=not scaling_lists)
    qc = (int(T.QUANT_SCALE[rem]) << 4) // sl
    add = 171 << (qbits - 9)
    return np.asarray(qc, np.int32), qbits, add


def dequant_params(size: int, qp: int, is_intra: bool, scaling_lists: bool):
    log2n = size.bit_length() - 1
    per, rem = qp // 6, qp % 6
    tshift = T.MAX_TR_DYNAMIC_RANGE - 8 - log2n
    dq = int(T.INV_QUANT_SCALE[rem]) * T.scaling_list(size, is_intra,
                                                      flat=not scaling_lists)
    shift = T.QUANT_IQUANT_SHIFT - T.QUANT_SHIFT - tshift + 4
    return np.asarray(dq, np.int32), shift, per


def quantize(coef: jnp.ndarray, size: int, qp: int, is_intra: bool,
             scaling_lists: bool = False) -> jnp.ndarray:
    """coef: (..., N, N) int32. Product |coef|*qc < 2^31 (see golden)."""
    qc, qbits, add = quant_params(size, qp, is_intra, scaling_lists)
    a = jnp.abs(coef)
    level = (a * jnp.asarray(qc) + add) >> qbits
    return jnp.clip(level * jnp.sign(coef), -32768, 32767).astype(jnp.int32)


def dequantize(level: jnp.ndarray, size: int, qp: int, is_intra: bool,
               scaling_lists: bool = False) -> jnp.ndarray:
    dq, shift, per = dequant_params(size, qp, is_intra, scaling_lists)
    lv = level.astype(jnp.int32)
    prod = lv * jnp.asarray(dq)
    if shift > per:
        s = shift - per
        out = (prod + (1 << (s - 1))) >> s
    else:
        # left shift with saturation-equivalent pre-clip (exact: final value
        # is clipped to int16 anyway, and -32768/32767 are >>s-invariant)
        s = per - shift
        out = jnp.clip(prod, -(32768 >> s), 32767 >> s) << s
    return jnp.clip(out, -32768, 32767).astype(jnp.int32)


def sign_bit_hiding(level: jnp.ndarray, coef: jnp.ndarray, size: int, qp: int,
                    is_intra: bool, scan_idx: int,
                    scaling_lists: bool = False) -> jnp.ndarray:
    """Vectorized SBH over (..., N, N) blocks, bit-exact to golden.

    Golden picks, per eligible CG with wrong parity, the position minimizing
    cost over {increase |l| (cost 256-delta), decrease |l| (cost 256+delta,
    not allowed on a first coeff with |l|==1)}; ties resolved by scan order
    (first position wins; up beats down at equal cost).
    """
    n = size
    log2n = n.bit_length() - 1
    scan = np.asarray(T.coeff_scan(log2n, scan_idx))
    ncg = (n * n) // 16
    batch = level.shape[:-2]
    flat_l = level.reshape(batch + (n * n,))[..., scan]      # scan order
    flat_c = coef.reshape(batch + (n * n,))[..., scan]
    cg_l = flat_l.reshape(batch + (ncg, 16))
    cg_c = flat_c.reshape(batch + (ncg, 16))

    qc, qbits, _ = quant_params(n, qp, is_intra, scaling_lists)
    qc_scan = np.asarray(qc, np.int64).reshape(-1)[scan].reshape(ncg, 16)
    abs_c = jnp.abs(cg_c)
    abs_l = jnp.abs(cg_l)
    # delta_u = (|c|*qc - |l|<<qbits) >> (qbits-8); |c|*qc can reach 2^31 —
    # compute in two shifted halves to stay in int32:
    # (a*q) >> (qbits-8) == ((a*q) >> 8) >> (qbits-16) ... needs exactness of
    # the subtraction BEFORE shifting; use float64? Not on TPU. Instead note
    # |c|<=32767, qc<=26214*16/16: do in int32 via int64-free split:
    # delta = ((a*qc) - (|l|<<qbits)) >> (qbits-8). a*qc < 2^31 (as in quant);
    # |l|<<qbits can overflow for large l — but then l is huge and the CG is
    # ineligible in practice; clamp the shifted term.
    shifted_l = jnp.clip(abs_l, 0, (1 << 30) >> qbits) << qbits
    delta_u = (abs_c * jnp.asarray(qc_scan, jnp.int32) - shifted_l) >> (qbits - 8)

    nz = cg_l != 0
    idx = jnp.arange(16)
    has_nz = jnp.any(nz, axis=-1)
    first = jnp.argmax(nz, axis=-1)                       # first nz scan pos
    last = 15 - jnp.argmax(nz[..., ::-1], axis=-1)        # last nz scan pos
    eligible = has_nz & ((last - first) >= T.SBH_THRESHOLD)
    sign_first = jnp.take_along_axis(
        cg_l, first[..., None], axis=-1)[..., 0] < 0
    parity = (jnp.sum(abs_l, axis=-1) & 1).astype(bool)
    need_fix = eligible & (parity != sign_first)

    in_range = (idx >= first[..., None]) & (idx <= last[..., None]) & nz
    big = jnp.int32(1 << 23)  # sentinel; must survive the *64 tiebreak in int32
    cost_up = jnp.where(in_range, 256 - delta_u, big)
    is_first_one = (idx == first[..., None]) & (abs_l == 1)
    cost_dn = jnp.where(in_range & ~is_first_one, 256 + delta_u, big)
    # golden iterates k ascending, strict '<' favors earlier positions and,
    # within a position, up before down. Encode preference in tiebreaker:
    # cost*64 + 2*k + (0 for up, 1 for dn)
    comb_up = cost_up * 64 + 2 * idx
    comb_dn = cost_dn * 64 + 2 * idx + 1
    comb = jnp.minimum(comb_up, comb_dn)
    best_k = jnp.argmin(comb, axis=-1)
    best_comb = jnp.min(comb, axis=-1)
    dir_up = (best_comb & 1) == 0
    step = jnp.where(dir_up, 1, -1)
    lv_at = jnp.take_along_axis(cg_l, best_k[..., None], axis=-1)[..., 0]
    new_val = lv_at + step * jnp.where(lv_at > 0, 1, -1)
    upd = jnp.where(need_fix, new_val, lv_at)
    cg_l = jnp.where(
        (idx == best_k[..., None]) & need_fix[..., None],
        upd[..., None], cg_l)
    out_scan = cg_l.reshape(batch + (n * n,))
    out = jnp.zeros_like(out_scan)
    out = out.at[..., scan].set(out_scan)
    return out.reshape(batch + (n, n)).astype(jnp.int32)
