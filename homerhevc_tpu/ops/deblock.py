"""Device (JAX) deblocking filter for the uniform-grid intra path
(CTB = CU = TU = `bsize`, every interior edge BS=2, uniform QP).

Bit-exact to golden/deblock.py (oracle tests in tests/test_deblock.py).
Runs as two batched passes over edge strips: all vertical edges, then all
horizontal edges on the vertically-filtered plane (normative order).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from homerhevc_tpu.golden.deblock import BETA_TABLE, TC_TABLE
from homerhevc_tpu.hevc.tables import chroma_qp


def _clip3(lo, hi, v):
    return jnp.minimum(jnp.maximum(v, lo), hi)


def _luma_filter_groups(p, q, beta, tc):
    """p, q: (..., 4lines, 4taps) int32 (tap 0 adjacent to edge).
    beta/tc: scalars or per-group arrays broadcastable to the group dims."""
    tc_l = jnp.asarray(tc)[..., None]   # per-line broadcast of the group tc
    dp = jnp.abs(p[..., :, 2] - 2 * p[..., :, 1] + p[..., :, 0])
    dq = jnp.abs(q[..., :, 2] - 2 * q[..., :, 1] + q[..., :, 0])
    dp0, dp3 = dp[..., 0], dp[..., 3]
    dq0, dq3 = dq[..., 0], dq[..., 3]
    on = (dp0 + dq0 + dp3 + dq3) < beta

    def sc(k):
        return ((2 * (dp[..., k] + dq[..., k]) < (beta >> 2))
                & (jnp.abs(p[..., k, 3] - p[..., k, 0])
                   + jnp.abs(q[..., k, 0] - q[..., k, 3]) < (beta >> 3))
                & (jnp.abs(p[..., k, 0] - q[..., k, 0]) < ((5 * tc + 1) >> 1)))
    strong = on & sc(0) & sc(3)
    normal = on & ~strong

    p0, p1, p2, p3 = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    t2 = 2 * tc_l
    sp0 = _clip3(p0 - t2, p0 + t2, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3)
    sp1 = _clip3(p1 - t2, p1 + t2, (p2 + p1 + p0 + q0 + 2) >> 2)
    sp2 = _clip3(p2 - t2, p2 + t2, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3)
    sq0 = _clip3(q0 - t2, q0 + t2, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3)
    sq1 = _clip3(q1 - t2, q1 + t2, (q2 + q1 + q0 + p0 + 2) >> 2)
    sq2 = _clip3(q2 - t2, q2 + t2, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3)

    delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    do_line = jnp.abs(delta) < 10 * tc_l
    dlt = _clip3(-tc_l, tc_l, delta)
    np0 = jnp.clip(p0 + dlt, 0, 255)
    nq0 = jnp.clip(q0 - dlt, 0, 255)
    side = (beta + (beta >> 1)) >> 3
    dEp = (dp0 + dp3 < side)[..., None]
    dEq = (dq0 + dq3 < side)[..., None]
    tc2 = tc_l >> 1
    np1 = jnp.clip(p1 + _clip3(-tc2, tc2, (((p2 + p0 + 1) >> 1) - p1 + dlt) >> 1), 0, 255)
    nq1 = jnp.clip(q1 + _clip3(-tc2, tc2, (((q2 + q0 + 1) >> 1) - q1 - dlt) >> 1), 0, 255)

    sN = strong[..., None]
    nN = normal[..., None] & do_line
    op = jnp.stack([
        jnp.where(sN, sp0, jnp.where(nN, np0, p0)),
        jnp.where(sN, sp1, jnp.where(nN & dEp, np1, p1)),
        jnp.where(sN, sp2, p2),
        p3,
    ], axis=-1)
    oq = jnp.stack([
        jnp.where(sN, sq0, jnp.where(nN, nq0, q0)),
        jnp.where(sN, sq1, jnp.where(nN & dEq, nq1, q1)),
        jnp.where(sN, sq2, q2),
        q3,
    ], axis=-1)
    return op, oq


def _luma_vertical_pass(x, bsize, beta, tc):
    h, w = x.shape
    ne = w // bsize - 1
    if ne <= 0:
        return x
    xs = (np.arange(ne) + 1) * bsize
    cols = jnp.asarray(xs[:, None] + np.arange(-4, 4)[None, :])
    strips = x[:, cols].transpose(1, 0, 2)          # (E, H, 8)
    g = strips.reshape(ne, h // 4, 4, 8)
    p = g[..., 3::-1]
    q = g[..., 4:]
    op, oq = _luma_filter_groups(p, q, beta, tc)
    ng = jnp.concatenate([op[..., ::-1], oq], axis=-1)
    ns = ng.reshape(ne, h, 8).transpose(1, 0, 2)
    return x.at[:, cols].set(ns)


def deblock_luma_uniform(plane: jnp.ndarray, bsize: int, qp,
                         beta_offset: int = 0, tc_offset: int = 0):
    """plane: (H, W) int32, uniform TU grid of `bsize`, BS=2 everywhere.
    qp may be a Python int or a traced int32 scalar."""
    if isinstance(qp, (int, np.integer)):
        beta = int(BETA_TABLE[min(max(0, qp + beta_offset * 2), 51)])
        tc = int(TC_TABLE[min(max(0, qp + 2 + tc_offset * 2), 53)])
    else:
        beta = jnp.asarray(BETA_TABLE, jnp.int32)[
            jnp.clip(qp + beta_offset * 2, 0, 51)]
        tc = jnp.asarray(TC_TABLE, jnp.int32)[
            jnp.clip(qp + 2 + tc_offset * 2, 0, 53)]
    out = _luma_vertical_pass(plane, bsize, beta, tc)
    out = _luma_vertical_pass(out.T, bsize, beta, tc).T
    return out


def _chroma_pass(x, step, tc):
    h, w = x.shape
    ne = w // step - 1
    if ne <= 0:
        return x
    xs = (np.arange(ne) + 1) * step
    cols = jnp.asarray(xs[:, None] + np.arange(-2, 2)[None, :])
    s = x[:, cols].transpose(1, 0, 2)               # (E, h, 4): p1 p0 q0 q1
    p1, p0, q0, q1 = s[..., 0], s[..., 1], s[..., 2], s[..., 3]
    delta = _clip3(-tc, tc, (((q0 - p0) * 4) + p1 - q1 + 4) >> 3)
    np0 = jnp.clip(p0 + delta, 0, 255)
    nq0 = jnp.clip(q0 - delta, 0, 255)
    ns = jnp.stack([p1, np0, nq0, q1], axis=-1).transpose(1, 0, 2)
    return x.at[:, cols].set(ns)


def deblock_chroma_uniform(plane: jnp.ndarray, bsize_luma: int, qp,
                           chroma_qp_off: int = 0, tc_offset: int = 0):
    """Chroma plane; edges on the chroma 8-grid at TU boundaries (intra
    BS=2). For uniform luma grid `bsize_luma`, chroma edges are every
    max(8, bsize_luma/2) chroma samples. qp may be traced (tc == 0 then
    no-ops naturally: the filter delta clips to zero)."""
    step = max(8, bsize_luma // 2)
    if isinstance(qp, (int, np.integer)):
        qpc = chroma_qp(qp + chroma_qp_off)
        tc = int(TC_TABLE[min(max(0, qpc + 2 + tc_offset * 2), 53)])
        if tc == 0:
            return plane
    else:
        from homerhevc_tpu.hevc.tables import CHROMA_QP_MAP
        qpc = jnp.asarray(CHROMA_QP_MAP)[jnp.clip(qp + chroma_qp_off, 0, 57)]
        tc = jnp.asarray(TC_TABLE, jnp.int32)[
            jnp.clip(qpc + 2 + tc_offset * 2, 0, 53)]
    out = _chroma_pass(plane, step, tc)
    out = _chroma_pass(out.T, step, tc).T
    return out


def _chroma_bs_pass(x, m2, tc):
    """One direction of BS2-masked chroma deblocking. x: (hc, wc) int32
    chroma plane; edges every 8 chroma samples. m2: (ne, hc//4) bool —
    filter line-group g of edge e (from the luma 8-unit BS maps)."""
    hc, wc = x.shape
    ne = wc // 8 - 1
    if ne <= 0:
        return x
    xs = (np.arange(ne) + 1) * 8
    cols = jnp.asarray(xs[:, None] + np.arange(-2, 2)[None, :])
    s = x[:, cols].transpose(1, 0, 2)               # (E, hc, 4): p1 p0 q0 q1
    p1, p0, q0, q1 = s[..., 0], s[..., 1], s[..., 2], s[..., 3]
    delta = _clip3(-tc, tc, (((q0 - p0) * 4) + p1 - q1 + 4) >> 3)
    on = jnp.repeat(m2, 4, axis=1)                  # (E, hc)
    np0 = jnp.where(on, jnp.clip(p0 + delta, 0, 255), p0)
    nq0 = jnp.where(on, jnp.clip(q0 - delta, 0, 255), q0)
    ns = jnp.stack([p1, np0, nq0, q1], axis=-1).transpose(1, 0, 2)
    return x.at[:, cols].set(ns)


def deblock_chroma_bs(plane: jnp.ndarray, bs2_v: jnp.ndarray,
                      bs2_h: jnp.ndarray, qp, chroma_qp_off: int = 0,
                      tc_offset: int = 0):
    """Chroma deblocking over BS==2 edges only (spec 8.7.2.5.5), for inter
    frames carrying intra-fallback CUs. bs2_v/bs2_h: (h8, w8) bool luma
    8-unit maps marking BS2 on the unit's LEFT/TOP edge (chroma filters
    only where the luma coordinate is a multiple of 16, i.e. even units —
    odd-unit entries are ignored). qp may be traced."""
    from homerhevc_tpu.hevc.tables import CHROMA_QP_MAP
    if isinstance(qp, (int, np.integer)):
        qpc = chroma_qp(qp + chroma_qp_off)
        tc = int(TC_TABLE[min(max(0, qpc + 2 + tc_offset * 2), 53)])
    else:
        qpc = jnp.asarray(CHROMA_QP_MAP)[jnp.clip(qp + chroma_qp_off, 0, 57)]
        tc = jnp.asarray(TC_TABLE, jnp.int32)[
            jnp.clip(qpc + 2 + tc_offset * 2, 0, 53)]
    x = plane.astype(jnp.int32)
    # vertical edges: chroma edge e at x=8(e+1) <-> luma unit ux=2(e+1);
    # line group g (4 chroma rows) <-> luma unit row uy=g
    h8, w8 = bs2_v.shape
    ne_v = (x.shape[1] // 8) - 1
    mv = bs2_v.T[2 * (np.arange(ne_v) + 1), :]       # (E, h8)
    x = _chroma_bs_pass(x, mv, tc)
    ne_h = (x.shape[0] // 8) - 1
    mh = bs2_h[2 * (np.arange(ne_h) + 1), :]         # (E, w8)
    x = _chroma_bs_pass(x.T, mh, tc).T
    return x


def _bs_pass(x, bs, qp, boff, toff):
    """One direction of bs-gated luma deblocking on the dense 8-grid.
    x: (H, W) int32. bs: (h8, w8) strength of each unit's LEFT edge."""
    H, W = x.shape
    w8 = W // 8
    ne = w8 - 1
    if ne <= 0:
        return x
    xs = (np.arange(ne) + 1) * 8
    cols = jnp.asarray(xs[:, None] + np.arange(-4, 4)[None, :])
    strips = x[:, cols].transpose(1, 0, 2)          # (E, H, 8)
    g = strips.reshape(ne, H // 4, 4, 8)
    p = g[..., 3::-1]
    q = g[..., 4:]
    bsa = bs[:, 1:].T                                # (ne, h8)
    bsg = jnp.repeat(bsa, 2, axis=1)                 # (ne, h4)
    beta = jnp.asarray(BETA_TABLE, jnp.int32)[jnp.clip(qp + boff * 2, 0, 51)]
    tcv = jnp.asarray(TC_TABLE)[jnp.clip(qp + 2 * (bsg - 1) + toff * 2,
                                         0, 53)].astype(jnp.int32)
    op, oq = _luma_filter_groups(p, q, beta, tcv)
    off = (bsg == 0)[..., None, None]
    op = jnp.where(off, p, op)
    oq = jnp.where(off, q, oq)
    ng = jnp.concatenate([op[..., ::-1], oq], axis=-1)
    ns = ng.reshape(ne, H, 8).transpose(1, 0, 2)
    return x.at[:, cols].set(ns)


def deblock_luma_bs(plane: jnp.ndarray, bs_v: jnp.ndarray, bs_h: jnp.ndarray,
                    qp: int, beta_offset: int = 0, tc_offset: int = 0):
    """Luma deblocking with per-edge boundary strengths on the 8-grid
    (inter path: mixed TU sizes, BS in {0,1,2} per unit edge). Bit-exact to
    golden.deblock.deblock_plane_luma with constant QP maps. Chroma needs
    no pass in pure-inter frames (filtered only at BS==2, spec 8.7.2.5.5).
    """
    out = _bs_pass(plane.astype(jnp.int32), bs_v, qp, beta_offset, tc_offset)
    out = _bs_pass(out.T, bs_h.T, qp, beta_offset, tc_offset).T
    return out
