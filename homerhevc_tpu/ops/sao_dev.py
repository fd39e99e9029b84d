"""Device-side SAO: per-CTB edge-offset statistics, integer offset
derivation, rate-estimated mode decision and in-loop apply — all inside
the encoder's device program, so SAO no longer breaks the device-resident
reference chain (reference: hmr_sao.c stats :75 / offsets :480 / RDO
:663; device stats analog of hmr_sse42_sao.c:154 sse_sao_get_ctu_stats).

Parameters are NON-normative: only their syntax and the filter are. The
host CABAC writes whatever this module decides (params ride the wire
meta), and the decoder's filter of the same recon with the same params
reproduces the device apply bit-exactly (integer arithmetic only).

Scope: edge offsets (EO classes 0-3) with RD-refined offset magnitudes
(same argmin-over-magnitudes rule as the host RDO) and a lambda *
estimated-bits type decision per CTB; band offset and counted-bit merge
RDO remain host-path-only (hevc/sao.py sao_decide; merge flags here are
derived host-side from equal neighbouring params, which only compacts
syntax and never changes the filter).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# edgeIdx -> category (spec 8.7.3; hevc/sao.py EDGE_CAT)
_EDGE_CAT = (1, 2, 0, 3, 4)
_EO_DELTAS = ((0, -1, 0, 1), (-1, 0, 1, 0), (-1, -1, 1, 1), (1, -1, -1, 1))
MAX_OFFSET = 7


def _eo_cat(plane, ec):
    """Per-sample EO category plane (0..4); plane-boundary samples 0."""
    h, w = plane.shape
    dy0, dx0, dy1, dx1 = _EO_DELTAS[ec]

    def shift(dy, dx):
        return jnp.roll(plane, (-dy, -dx), axis=(0, 1))
    a = shift(dy0, dx0)
    b = shift(dy1, dx1)
    sgn = jnp.sign(plane - a) + jnp.sign(plane - b) + 2
    cat = jnp.asarray(_EDGE_CAT, jnp.int32)[sgn]
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    ok = ((ys + dy0 >= 0) & (ys + dy0 < h) & (xs + dx0 >= 0)
          & (xs + dx0 < w) & (ys + dy1 >= 0) & (ys + dy1 < h)
          & (xs + dx1 >= 0) & (xs + dx1 < w))
    return jnp.where(ok, cat, 0)


def _block_sum(x, n):
    h, w = x.shape
    return x.reshape(h // n, n, w // n, n).sum(axis=(1, 3))


def _derive(dsum, cnt, positive, lam_x256=None):
    """RD-refined integer offset + distortion delta (device twin of the
    host _rd_offset, hevc/sao.py): evaluate every magnitude 0..7 and
    keep argmin of dd*256 + lam*(m+1) TU bins. With lam None, falls
    back to the round-2 division + negative-dd gate."""
    if lam_x256 is not None:
        d_eff = jnp.abs(dsum)
        s = jnp.sign(dsum)
        best_cost = None
        best_m = jnp.zeros_like(cnt)
        for m in range(MAX_OFFSET + 1):
            dd_m = cnt * m * m - 2 * m * d_eff
            cost = dd_m * 256 + lam_x256 * (m + 1)
            if best_cost is None:
                best_cost = cost
            else:
                take = cost < best_cost
                best_cost = jnp.where(take, cost, best_cost)
                best_m = jnp.where(take, m, best_m)
        o = s * best_m
        o = jnp.maximum(o, 0) if positive else jnp.minimum(o, 0)
        dd = cnt * o * o - 2 * o * dsum
        bad = dd > 0
        return jnp.where(bad, 0, o), jnp.where(bad, 0, dd)
    s = jnp.sign(dsum)
    mag = (2 * jnp.abs(dsum) + cnt) // jnp.maximum(2 * cnt, 1)
    o = jnp.where(cnt > 0, s * mag, 0)
    o = jnp.clip(o, -MAX_OFFSET, MAX_OFFSET)
    o = jnp.maximum(o, 0) if positive else jnp.minimum(o, 0)
    dd = cnt * o * o - 2 * o * dsum
    bad = dd > 0
    return jnp.where(bad, 0, o), jnp.where(bad, 0, dd)


def _eo_stats(src, rec, n, lam_x256=None):
    """(dd[4, gh, gw], offs_abs[4, gh, gw, 4]) for one component."""
    diff = src - rec
    dds, offs = [], []
    for ec in range(4):
        cat = _eo_cat(rec, ec)
        dd_ec = 0
        off_ec = []
        for k, positive in ((1, True), (2, True), (3, False), (4, False)):
            m = cat == k
            cnt = _block_sum(m.astype(jnp.int32), n)
            dsum = _block_sum(jnp.where(m, diff, 0), n)
            o, dd = _derive(dsum, cnt, positive, lam_x256)
            off_ec.append(jnp.abs(o))
            dd_ec = dd_ec + dd
        dds.append(dd_ec)
        offs.append(jnp.stack(off_ec, axis=-1))
    return jnp.stack(dds), jnp.stack(offs)


def _apply_eo(plane, types, classes, offs, n):
    """Apply per-CTB EO params to one component plane.
    types/classes (gh, gw); offs (gh, gw, 4) abs values."""
    cats = jnp.stack([_eo_cat(plane, ec) for ec in range(4)])  # (4, h, w)
    rep = lambda a: jnp.repeat(jnp.repeat(a, n, 0), n, 1)
    cls_px = rep(classes)
    cat_sel = jnp.take_along_axis(cats, cls_px[None], axis=0)[0]
    # signed per-category luts broadcast per CTB
    adj = jnp.zeros_like(plane)
    sign = (1, 1, -1, -1)
    for k in range(4):
        adj = adj + jnp.where(cat_sel == k + 1, sign[k] * rep(offs[..., k]),
                              0)
    on = rep(types) != 0
    return jnp.where(on, jnp.clip(plane + adj, 0, 255), plane)


def sao_analyze_apply(sy, su, sv, ry, ru, rv, ctu, lam_x256):
    """Decide + apply SAO for one frame on device.

    All planes int32; ctu = luma CTB size; lam_x256 = int(lambda * 256).
    Returns (filtered ry, ru, rv, params dict of small int tensors)."""
    dd_l, off_l = _eo_stats(sy, ry, ctu, lam_x256)
    cost_l = dd_l * 256 + lam_x256 * (6 + off_l.sum(axis=-1))
    ec_l = jnp.argmin(cost_l, axis=0).astype(jnp.int32)
    gh, gw = ec_l.shape
    take2 = lambda a, i: jnp.take_along_axis(a, i[None], axis=0)[0]
    best_l = take2(cost_l, ec_l)
    on_l = best_l < lam_x256  # cost < lambda * 1.0 (x256 fixed point)
    type_l = jnp.where(on_l, 2, 0).astype(jnp.int32)
    ec_l = jnp.where(on_l, ec_l, 0)
    off_lb = jnp.where(
        on_l[..., None],
        jnp.take_along_axis(off_l, ec_l[None, ..., None], axis=0)[0], 0)

    nc = ctu // 2
    dd_u, off_u = _eo_stats(su, ru, nc, lam_x256)
    dd_v, off_v = _eo_stats(sv, rv, nc, lam_x256)
    cost_c = (dd_u + dd_v) * 256 \
        + lam_x256 * (8 + off_u.sum(axis=-1) + off_v.sum(axis=-1))
    ec_c = jnp.argmin(cost_c, axis=0).astype(jnp.int32)
    on_c = take2(cost_c, ec_c) < lam_x256
    type_c = jnp.where(on_c, 2, 0).astype(jnp.int32)
    ec_c = jnp.where(on_c, ec_c, 0)
    off_ub = jnp.where(
        on_c[..., None],
        jnp.take_along_axis(off_u, ec_c[None, ..., None], axis=0)[0], 0)
    off_vb = jnp.where(
        on_c[..., None],
        jnp.take_along_axis(off_v, ec_c[None, ..., None], axis=0)[0], 0)

    ry_f = _apply_eo(ry, type_l, ec_l, off_lb, ctu)
    ru_f = _apply_eo(ru, type_c, ec_c, off_ub, nc)
    rv_f = _apply_eo(rv, type_c, ec_c, off_vb, nc)
    params = {
        "type_l": type_l.astype(jnp.uint8),
        "type_c": type_c.astype(jnp.uint8),
        "ec_l": ec_l.astype(jnp.uint8),
        "ec_c": ec_c.astype(jnp.uint8),
        "off": jnp.stack([off_lb, off_ub, off_vb], axis=2).astype(jnp.int8),
    }
    return ry_f, ru_f, rv_f, params


def pack_params(params):
    """Flatten the params dict to one uint8 vector (wire meta section)."""
    off_u8 = jax.lax.bitcast_convert_type(params["off"],
                                          jnp.uint8).reshape(-1)
    return jnp.concatenate([
        params["type_l"].reshape(-1), params["type_c"].reshape(-1),
        params["ec_l"].reshape(-1), params["ec_c"].reshape(-1), off_u8])


def params_nbytes(gh, gw):
    return gh * gw * (4 + 12)


def unpack_params(buf, gh, gw):
    """Host inverse of pack_params -> hevc.sao.SaoFrameParams (merge flags
    derived from equal neighbouring params, syntax-only compaction)."""
    import numpy as np

    from homerhevc_tpu.hevc.sao import SaoFrameParams
    n = gh * gw
    p = SaoFrameParams.alloc(gh, gw)
    b = np.asarray(buf, np.uint8)
    p.type_luma[:] = b[:n].reshape(gh, gw)
    p.type_chroma[:] = b[n:2 * n].reshape(gh, gw)
    p.eo_class_luma[:] = b[2 * n:3 * n].reshape(gh, gw)
    p.eo_class_chroma[:] = b[3 * n:4 * n].reshape(gh, gw)
    p.offsets[:] = b[4 * n:4 * n + 12 * n].copy().view(np.int8) \
        .reshape(gh, gw, 3, 4)

    def same_shift(ax, ay):
        ok = np.ones((gh, gw), bool)
        for arr in (p.type_luma, p.type_chroma, p.eo_class_luma,
                    p.eo_class_chroma):
            sh = np.roll(arr, (ay, ax), axis=(0, 1))
            ok &= arr == sh
        for arr in (p.band_pos, p.offsets):
            sh = np.roll(arr, (ay, ax), axis=(0, 1))
            ok &= (arr == sh).reshape(gh, gw, -1).all(axis=2)
        return ok
    left_same = same_shift(1, 0)
    left_same[:, 0] = False
    up_same = same_shift(0, 1)
    up_same[0, :] = False
    p.merge_left[:] = left_same
    p.merge_up[:] = (~left_same) & up_same
    return p
