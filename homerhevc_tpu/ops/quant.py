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


def _static_qp(qp) -> bool:
    return isinstance(qp, (int, np.integer))


def _qc6(size: int, is_intra: bool, scaling_lists: bool) -> np.ndarray:
    """Forward scale tables for all six qp%6 classes: (6, N, N) int32."""
    sl = T.scaling_list(size, is_intra, flat=not scaling_lists)
    return np.stack([(int(T.QUANT_SCALE[r]) << 4) // sl for r in range(6)]) \
        .astype(np.int32)


def _dq6(size: int, is_intra: bool, scaling_lists: bool) -> np.ndarray:
    sl = T.scaling_list(size, is_intra, flat=not scaling_lists)
    return np.stack([int(T.INV_QUANT_SCALE[r]) * sl for r in range(6)]) \
        .astype(np.int32)


def quantize(coef: jnp.ndarray, size: int, qp, is_intra: bool,
             scaling_lists: bool = False) -> jnp.ndarray:
    """coef: (..., N, N) int32. Product |coef|*qc < 2^31 (see golden).

    qp may be a Python int (static tables baked into the program) or a
    traced int32 scalar (QP becomes a device input: the 6-periodic scale
    table is indexed with qp%6 and the shift uses qp//6, so one compiled
    program serves every QP — the requirement for device-path CBR/VBR and
    per-CTU QP)."""
    if _static_qp(qp):
        qc, qbits, add = quant_params(size, qp, is_intra, scaling_lists)
        a = jnp.abs(coef)
        level = (a * jnp.asarray(qc) + add) >> qbits
        return jnp.clip(level * jnp.sign(coef), -32768, 32767) \
            .astype(jnp.int32)
    log2n = size.bit_length() - 1
    tshift = T.MAX_TR_DYNAMIC_RANGE - 8 - log2n
    qp = jnp.asarray(qp)
    per, rem = qp // 6, qp % 6
    qc = jnp.asarray(_qc6(size, is_intra, scaling_lists))[rem]
    qbits = (T.QUANT_SHIFT + tshift + per).astype(jnp.int32)
    if qbits.ndim:
        # per-block QP vector: qp shape must equal coef.shape[:-2]
        qbits = qbits.reshape(qbits.shape + (1, 1))
    add = jnp.left_shift(jnp.int32(171), qbits - 9)
    a = jnp.abs(coef)
    level = jnp.right_shift(a * qc + add, qbits)
    return jnp.clip(level * jnp.sign(coef), -32768, 32767).astype(jnp.int32)


def dequantize(level: jnp.ndarray, size: int, qp, is_intra: bool,
               scaling_lists: bool = False) -> jnp.ndarray:
    if _static_qp(qp):
        dq, shift, per = dequant_params(size, qp, is_intra, scaling_lists)
        lv = level.astype(jnp.int32)
        prod = lv * jnp.asarray(dq)
        if shift > per:
            s = shift - per
            out = (prod + (1 << (s - 1))) >> s
        else:
            # left shift with saturation-equivalent pre-clip (exact: final
            # value is clipped to int16 anyway, and -32768/32767 are
            # >>s-invariant)
            s = per - shift
            out = jnp.clip(prod, -(32768 >> s), 32767 >> s) << s
        return jnp.clip(out, -32768, 32767).astype(jnp.int32)
    log2n = size.bit_length() - 1
    tshift = T.MAX_TR_DYNAMIC_RANGE - 8 - log2n
    shift = T.QUANT_IQUANT_SHIFT - T.QUANT_SHIFT - tshift + 4
    qp = jnp.asarray(qp)
    per, rem = qp // 6, qp % 6
    dq = jnp.asarray(_dq6(size, is_intra, scaling_lists))[rem]
    lv = level.astype(jnp.int32)
    if per.ndim:
        # per-block QP vector (shape == level.shape[:-2])
        per = per.reshape(per.shape + (1, 1))
    prod = lv * dq
    # both shift directions computed branchless, selected on per<shift
    s1 = jnp.maximum(shift - per, 1).astype(jnp.int32)
    out_r = jnp.right_shift(prod + jnp.left_shift(jnp.int32(1), s1 - 1), s1)
    s2 = jnp.maximum(per - shift, 0).astype(jnp.int32)
    hi = jnp.right_shift(jnp.int32(32767), s2)
    lo = -jnp.right_shift(jnp.int32(32768), s2)
    out_l = jnp.left_shift(jnp.clip(prod, lo, hi), s2)
    out = jnp.where(per < shift, out_r, out_l)
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

    if _static_qp(qp):
        qc, qbits, _ = quant_params(n, qp, is_intra, scaling_lists)
        qc_scan = jnp.asarray(
            np.asarray(qc, np.int64).reshape(-1)[scan].reshape(ncg, 16)
            .astype(np.int32))
    else:
        log2n_ = n.bit_length() - 1
        tshift = T.MAX_TR_DYNAMIC_RANGE - 8 - log2n_
        qp = jnp.asarray(qp)
        qbits = (T.QUANT_SHIFT + tshift + qp // 6).astype(jnp.int32)
        if qbits.ndim:
            # per-block QP vector (shape == level.shape[:-2])
            qbits = qbits.reshape(qbits.shape + (1, 1))
        qc6 = _qc6(n, is_intra, scaling_lists)
        qc_scan6 = qc6.reshape(6, -1)[:, scan].reshape(6, ncg, 16)
        qc_scan = jnp.asarray(qc_scan6)[qp % 6]
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
    cap = jnp.right_shift(jnp.int32(1 << 30), qbits)
    shifted_l = jnp.left_shift(jnp.clip(abs_l, 0, cap), qbits)
    delta_u = jnp.right_shift(abs_c * qc_scan - shifted_l, qbits - 8)

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
