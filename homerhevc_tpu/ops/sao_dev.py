"""Device-side SAO: per-CTB edge-offset AND band-offset statistics,
integer offset derivation, rate-estimated mode decision and in-loop apply
— all inside the encoder's device program, so SAO never breaks the
device-resident reference chain (reference: hmr_sao.c stats :75 / offsets
:480 / RDO :663; device stats analog of hmr_sse42_sao.c:154
sse_sao_get_ctu_stats, which accumulates the 4 EO-class histograms AND
the 32-band BO histogram in one pass — mirrored here by _eo_stats +
_bo_stats inside one jitted program).

Parameters are NON-normative: only their syntax and the filter are. The
host CABAC writes whatever this module decides (params ride the wire
meta), and the decoder's filter of the same recon with the same params
reproduces the device apply bit-exactly (integer arithmetic only).

Scope: EO classes 0-3 and BO (32-band histogram -> best wrapping 4-band
window, hmr_sao.c:480-620 analog) with RD-refined offset magnitudes and
a lambda * estimated-bits type decision per CTB. Counted-bit merge RDO
remains host-path-only; merge flags here are derived host-side from
equal neighbouring params (unpack_params), which only compacts syntax
and never changes the filter.
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
    # EDGE_CAT (1,2,0,3,4) as a select chain: per-pixel LUT gathers are
    # the slowest op class on TPU (measured 73 ms/frame SAO at 1080p,
    # dominated by exactly these); two selects replace the gather
    cat = jnp.where(sgn == 2, 0, jnp.where(sgn < 2, sgn + 1, sgn))
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


def _bo_stats(src, rec, n):
    """(cnt[gh, gw, 32], dsum[gh, gw, 32]) int32: per-CTB 32-band
    histograms (band = rec >> 3; reference accumulates the same histogram
    in sse_sao_get_ctu_stats, hmr_sse42_sao.c:154). Loop over the 32
    bands with fused compare + block-reduce — no (pixels x 32) one-hot
    intermediate is materialized."""
    band = rec >> 3
    diff = src - rec
    cnts, sums = [], []
    for b in range(32):
        m = band == b
        cnts.append(_block_sum(m.astype(jnp.int32), n))
        sums.append(_block_sum(jnp.where(m, diff, 0), n))
    return jnp.stack(cnts, axis=-1), jnp.stack(sums, axis=-1)


def _bo_derive(src, rec, n, lam_x256):
    """Band-offset candidate for one component: per-band RD offsets
    (signed; TU bins + sign bin), then the best wrapping 4-band window
    (reference derivation hmr_sao.c:480-620). Returns
    (dd[gh, gw], off[gh, gw, 4] SIGNED, band[gh, gw], bits[gh, gw])."""
    cnt, dsum = _bo_stats(src, rec, n)
    d_eff = jnp.abs(dsum)
    s = jnp.sign(dsum)
    best_cost = None
    best_m = jnp.zeros_like(cnt)
    for m in range(MAX_OFFSET + 1):
        dd_m = cnt * m * m - 2 * m * d_eff
        bits_m = m + (1 if m < MAX_OFFSET else 0) + (1 if m > 0 else 0)
        cost = dd_m * 256 + lam_x256 * bits_m
        if best_cost is None:
            best_cost = cost
        else:
            take = cost < best_cost
            best_cost = jnp.where(take, cost, best_cost)
            best_m = jnp.where(take, m, best_m)
    dd_b = cnt * best_m * best_m - 2 * best_m * d_eff
    bad = dd_b > 0
    best_m = jnp.where(bad, 0, best_m)
    dd_b = jnp.where(bad, 0, dd_b)
    o_b = s * best_m                                     # (gh, gw, 32)
    bits_b = best_m + (best_m < MAX_OFFSET) + (best_m > 0)
    # best wrapping 4-band window
    dd4 = sum(jnp.roll(dd_b, -k, axis=-1) for k in range(4))
    bits4 = sum(jnp.roll(bits_b, -k, axis=-1) for k in range(4))
    cost4 = dd4 * 256 + lam_x256 * bits4                 # (gh, gw, 32)
    band = jnp.argmin(cost4, axis=-1).astype(jnp.int32)  # (gh, gw)
    take = lambda a: jnp.take_along_axis(a, band[..., None], axis=-1)[..., 0]
    off = jnp.stack([jnp.take_along_axis(o_b, ((band + k) % 32)[..., None],
                                         axis=-1)[..., 0]
                     for k in range(4)], axis=-1)
    return take(dd4), off, band, take(bits4)


def _apply_sao(plane, types, classes, offs, band_pos, comp, n):
    """Apply per-CTB SAO params to one component plane.
    types/classes/band_pos (gh, gw); offs (gh, gw, 4) — EO magnitudes
    (category signs applied here) / BO signed. comp selects the band_pos
    and offs channel upstream; here they are already per-component."""
    rep = lambda a: jnp.repeat(jnp.repeat(a, n, 0), n, 1)
    # EO adjustment (class selection via selects, not per-pixel gathers)
    cls_px = rep(classes)
    cat_sel = jnp.zeros_like(plane)
    for ec in range(4):
        cat_sel = jnp.where(cls_px == ec, _eo_cat(plane, ec), cat_sel)
    adj_eo = jnp.zeros_like(plane)
    sign = (1, 1, -1, -1)
    for k in range(4):
        adj_eo = adj_eo + jnp.where(cat_sel == k + 1,
                                    sign[k] * rep(offs[..., k]), 0)
    # BO adjustment: pixel band == (band_pos + k) & 31 -> offs[k] (signed)
    band_px = plane >> 3
    bp = rep(band_pos)
    adj_bo = jnp.zeros_like(plane)
    for k in range(4):
        adj_bo = adj_bo + jnp.where(band_px == ((bp + k) & 31),
                                    rep(offs[..., k]), 0)
    t = rep(types)
    out = jnp.where(t == 2, jnp.clip(plane + adj_eo, 0, 255),
                    jnp.where(t == 1, jnp.clip(plane + adj_bo, 0, 255),
                              plane))
    return out


def sao_analyze_apply(sy, su, sv, ry, ru, rv, ctu, lam_x256):
    """Decide + apply SAO for one frame on device.

    All planes int32; ctu = luma CTB size; lam_x256 = int(lambda * 256).
    Returns (filtered ry, ru, rv, params dict of small int tensors).
    Types: 0 = off, 1 = band (SAO_BAND), 2 = edge (SAO_EDGE)."""
    # ---- luma: EO (per class) vs BO vs OFF ----
    dd_l, off_l = _eo_stats(sy, ry, ctu, lam_x256)
    cost_l = dd_l * 256 + lam_x256 * (6 + off_l.sum(axis=-1))
    ec_l = jnp.argmin(cost_l, axis=0).astype(jnp.int32)
    gh, gw = ec_l.shape
    take2 = lambda a, i: jnp.take_along_axis(a, i[None], axis=0)[0]
    best_eo_l = take2(cost_l, ec_l)
    dd_bo_l, off_bo_l, band_l, bits_bo_l = _bo_derive(sy, ry, ctu, lam_x256)
    cost_bo_l = dd_bo_l * 256 + lam_x256 * (9 + bits_bo_l)
    bo_wins_l = cost_bo_l < best_eo_l
    best_l = jnp.minimum(best_eo_l, cost_bo_l)
    on_l = best_l < lam_x256  # cost < lambda * 1.0 (x256 fixed point)
    type_l = jnp.where(on_l, jnp.where(bo_wins_l, 1, 2), 0).astype(jnp.int32)
    ec_l = jnp.where(type_l == 2, ec_l, 0)
    band_l = jnp.where(type_l == 1, band_l, 0)
    off_eo_sel = jnp.take_along_axis(off_l, ec_l[None, ..., None],
                                     axis=0)[0]
    off_lb = jnp.where(type_l[..., None] == 2, off_eo_sel,
                       jnp.where(type_l[..., None] == 1, off_bo_l, 0))

    # ---- chroma: shared type + shared EO class, joint Cb+Cr cost ----
    nc = ctu // 2
    dd_u, off_u = _eo_stats(su, ru, nc, lam_x256)
    dd_v, off_v = _eo_stats(sv, rv, nc, lam_x256)
    cost_c = (dd_u + dd_v) * 256 \
        + lam_x256 * (8 + off_u.sum(axis=-1) + off_v.sum(axis=-1))
    ec_c = jnp.argmin(cost_c, axis=0).astype(jnp.int32)
    best_eo_c = take2(cost_c, ec_c)
    dd_bo_u, off_bo_u, band_u, bits_bo_u = _bo_derive(su, ru, nc, lam_x256)
    dd_bo_v, off_bo_v, band_v, bits_bo_v = _bo_derive(sv, rv, nc, lam_x256)
    cost_bo_c = (dd_bo_u + dd_bo_v) * 256 \
        + lam_x256 * (12 + bits_bo_u + bits_bo_v)
    bo_wins_c = cost_bo_c < best_eo_c
    best_c = jnp.minimum(best_eo_c, cost_bo_c)
    on_c = best_c < lam_x256
    type_c = jnp.where(on_c, jnp.where(bo_wins_c, 1, 2), 0).astype(jnp.int32)
    ec_c = jnp.where(type_c == 2, ec_c, 0)
    band_u = jnp.where(type_c == 1, band_u, 0)
    band_v = jnp.where(type_c == 1, band_v, 0)
    off_ub = jnp.where(
        type_c[..., None] == 2,
        jnp.take_along_axis(off_u, ec_c[None, ..., None], axis=0)[0],
        jnp.where(type_c[..., None] == 1, off_bo_u, 0))
    off_vb = jnp.where(
        type_c[..., None] == 2,
        jnp.take_along_axis(off_v, ec_c[None, ..., None], axis=0)[0],
        jnp.where(type_c[..., None] == 1, off_bo_v, 0))

    ry_f = _apply_sao(ry, type_l, ec_l, off_lb, band_l, 0, ctu)
    ru_f = _apply_sao(ru, type_c, ec_c, off_ub, band_u, 1, nc)
    rv_f = _apply_sao(rv, type_c, ec_c, off_vb, band_v, 2, nc)
    params = {
        "type_l": type_l.astype(jnp.uint8),
        "type_c": type_c.astype(jnp.uint8),
        "ec_l": ec_l.astype(jnp.uint8),
        "ec_c": ec_c.astype(jnp.uint8),
        "band": jnp.stack([band_l, band_u, band_v],
                          axis=-1).astype(jnp.uint8),
        "off": jnp.stack([off_lb, off_ub, off_vb], axis=2).astype(jnp.int8),
    }
    return ry_f, ru_f, rv_f, params


def pack_params(params):
    """Flatten the params dict to one uint8 vector (wire meta section)."""
    off_u8 = jax.lax.bitcast_convert_type(params["off"],
                                          jnp.uint8).reshape(-1)
    return jnp.concatenate([
        params["type_l"].reshape(-1), params["type_c"].reshape(-1),
        params["ec_l"].reshape(-1), params["ec_c"].reshape(-1),
        params["band"].reshape(-1), off_u8])


def params_nbytes(gh, gw):
    return gh * gw * (4 + 3 + 12)


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
    p.band_pos[:] = b[4 * n:7 * n].reshape(gh, gw, 3)
    p.offsets[:] = b[7 * n:7 * n + 12 * n].copy().view(np.int8) \
        .reshape(gh, gw, 3, 4)
    # the EO serializer writes magnitudes with category-implied signs; the
    # BO serializer writes signed offsets — both conventions match the
    # host SaoFrameParams (hevc/sao.py)

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
