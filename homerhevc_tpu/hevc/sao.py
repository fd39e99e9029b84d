"""SAO: parameter model, golden apply (decoder-exact, spec 8.7.3),
statistics collection and a simple conformant RDO decision.

Parity with reference: hmr_sao.c (stats :75, offsets :480, mode RDO
:663/:854, apply :960/:1210) — decisions here are simpler (stats-driven
offsets + lambda cost) which is legal: SAO parameters are non-normative,
only their syntax and the filter are.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from homerhevc_tpu.hevc import tables as T

SAO_OFF, SAO_BAND, SAO_EDGE = 0, 1, 2
# edgeIdx -> category mapping (spec 8.7.3: 0,1->min/edge, 2->none, 3,4)
EDGE_CAT = np.array([1, 2, 0, 3, 4], np.int32)
# EO class sample offsets (hPos/vPos pairs)
EO_DELTAS = {
    0: ((0, -1), (0, 1)),     # horizontal
    1: ((-1, 0), (1, 0)),     # vertical
    2: ((-1, -1), (1, 1)),    # 135 deg
    3: ((1, -1), (-1, 1)),    # 45 deg
}
MAX_OFFSET = 7  # (1 << (min(8,10)-5)) - 1


@dataclasses.dataclass
class SaoFrameParams:
    """Per-CTU SAO decisions. Arrays indexed [ctu_y, ctu_x]."""
    merge_left: np.ndarray   # bool
    merge_up: np.ndarray     # bool
    type_luma: np.ndarray    # 0/1/2
    type_chroma: np.ndarray  # 0/1/2 (shared cb/cr)
    eo_class_luma: np.ndarray    # 0..3
    eo_class_chroma: np.ndarray  # 0..3
    band_pos: np.ndarray     # (cy, cx, 3) band position per component
    offsets: np.ndarray      # (cy, cx, 3, 4) signed offsets per component

    @classmethod
    def alloc(cls, cy: int, cx: int) -> "SaoFrameParams":
        return cls(
            merge_left=np.zeros((cy, cx), bool),
            merge_up=np.zeros((cy, cx), bool),
            type_luma=np.zeros((cy, cx), np.int32),
            type_chroma=np.zeros((cy, cx), np.int32),
            eo_class_luma=np.zeros((cy, cx), np.int32),
            eo_class_chroma=np.zeros((cy, cx), np.int32),
            band_pos=np.zeros((cy, cx, 3), np.int32),
            offsets=np.zeros((cy, cx, 3, 4), np.int32),
        )

    def copy_from(self, sy, sx, dy, dx):
        self.type_luma[dy, dx] = self.type_luma[sy, sx]
        self.type_chroma[dy, dx] = self.type_chroma[sy, sx]
        self.eo_class_luma[dy, dx] = self.eo_class_luma[sy, sx]
        self.eo_class_chroma[dy, dx] = self.eo_class_chroma[sy, sx]
        self.band_pos[dy, dx] = self.band_pos[sy, sx]
        self.offsets[dy, dx] = self.offsets[sy, sx]


def _eo_categories(plane: np.ndarray, eo_class: int) -> np.ndarray:
    """Per-sample EO category (0..4); boundary samples get 0 (unfiltered)."""
    h, w = plane.shape
    p = plane.astype(np.int32)
    (dy0, dx0), (dy1, dx1) = EO_DELTAS[eo_class]
    a = np.zeros((h, w), np.int32)
    b = np.zeros((h, w), np.int32)
    valid = np.zeros((h, w), bool)
    ys, xs = np.mgrid[0:h, 0:w]
    y0, x0 = ys + dy0, xs + dx0
    y1, x1 = ys + dy1, xs + dx1
    ok = (y0 >= 0) & (y0 < h) & (x0 >= 0) & (x0 < w) & \
         (y1 >= 0) & (y1 < h) & (x1 >= 0) & (x1 < w)
    a[ok] = p[y0[ok], x0[ok]]
    b[ok] = p[y1[ok], x1[ok]]
    sgn = np.sign(p - a) + np.sign(p - b) + 2
    cat = EDGE_CAT[sgn]
    cat[~ok] = 0
    return cat


def sao_apply_component(plane: np.ndarray, params: SaoFrameParams,
                        comp: int, ctu_size: int) -> np.ndarray:
    """Apply SAO to a full (deblocked) component plane. comp: 0=Y,1=Cb,2=Cr.
    ctu_size is in THIS component's samples."""
    out = plane.astype(np.int32).copy()
    h, w = plane.shape
    cy_n, cx_n = params.type_luma.shape
    type_map = params.type_luma if comp == 0 else params.type_chroma
    eo_map = params.eo_class_luma if comp == 0 else params.eo_class_chroma
    # precompute per-class category planes lazily
    cats = {}
    for cy in range(cy_n):
        for cx in range(cx_n):
            t = int(type_map[cy, cx])
            if t == SAO_OFF:
                continue
            y0, x0 = cy * ctu_size, cx * ctu_size
            y1, x1 = min(y0 + ctu_size, h), min(x0 + ctu_size, w)
            off = params.offsets[cy, cx, comp]
            if t == SAO_BAND:
                bp = int(params.band_pos[cy, cx, comp])
                lut = np.zeros(32, np.int32)
                for k in range(4):
                    lut[(bp + k) % 32] = off[k]
                blk = plane[y0:y1, x0:x1].astype(np.int32)
                out[y0:y1, x0:x1] = np.clip(blk + lut[blk >> 3], 0, 255)
            else:
                ec = int(eo_map[cy, cx])
                if ec not in cats:
                    cats[ec] = _eo_categories(plane, ec)
                cat = cats[ec][y0:y1, x0:x1]
                lut = np.array([0, off[0], off[1], -off[2], -off[3]], np.int32)
                blk = plane[y0:y1, x0:x1].astype(np.int32)
                out[y0:y1, x0:x1] = np.clip(blk + lut[cat], 0, 255)
    return out


def _stats_for_block(src, rec, cat, ncat=5):
    diffs = np.zeros(ncat, np.int64)
    counts = np.zeros(ncat, np.int64)
    d = src.astype(np.int64) - rec.astype(np.int64)
    for c in range(ncat):
        m = cat == c
        counts[c] = m.sum()
        diffs[c] = d[m].sum()
    return diffs, counts


def _best_offset(diff, count, max_abs=MAX_OFFSET, positive=None):
    if count == 0:
        return 0, 0
    o = int(np.round(diff / count))
    o = max(-max_abs, min(max_abs, o))
    if positive is True:
        o = max(0, o)
    if positive is False:
        o = min(0, o)
    # distortion delta for applying offset o: count*o^2 - 2*o*diff
    dd = count * o * o - 2 * o * diff
    if dd > 0:
        return 0, 0
    return o, dd


def _block_sum(x: np.ndarray, by: int, bx: int) -> np.ndarray:
    h, w = x.shape
    return x.reshape(h // by, by, w // bx, bx).sum(axis=(1, 3))


def _eo_stats_vec(src, rec, ctu):
    """Per-class EO stats for one component: returns (dd[4,gh,gw],
    offs[4,gh,gw,4]) — distortion delta and abs offsets per EO class."""
    h, w = src.shape
    gh, gw = h // ctu, w // ctu
    diff = src.astype(np.int64) - rec.astype(np.int64)
    dd_all = np.zeros((4, gh, gw), np.float64)
    off_all = np.zeros((4, gh, gw, 4), np.int64)
    for ec in range(4):
        cat = _eo_categories(rec, ec)
        for k, positive in ((1, True), (2, True), (3, False), (4, False)):
            m = cat == k
            cnt = _block_sum(m.astype(np.int64), ctu, ctu)
            dsum = _block_sum(np.where(m, diff, 0), ctu, ctu)
            o = np.where(cnt > 0, np.round(dsum / np.maximum(cnt, 1)), 0)
            o = np.clip(o, -MAX_OFFSET, MAX_OFFSET).astype(np.int64)
            o = np.maximum(o, 0) if positive else np.minimum(o, 0)
            dd = cnt * o * o - 2 * o * dsum
            bad = dd > 0
            o = np.where(bad, 0, o)
            dd = np.where(bad, 0, dd)
            off_all[ec, :, :, k - 1] = np.abs(o)
            dd_all[ec] += dd
    return dd_all, off_all


def _decide_component_vec(src, rec, ctu, lam, extra_bits):
    """Vectorized per-CTU EO decision for one component."""
    dd_all, off_all = _eo_stats_vec(src, rec, ctu)
    cost = dd_all + lam * (extra_bits + off_all.sum(axis=3))
    best_class = cost.argmin(axis=0)
    gh, gw = best_class.shape
    iy, ix = np.mgrid[0:gh, 0:gw]
    best_cost = cost[best_class, iy, ix]
    chosen = best_cost < lam * 1.0
    best_off = off_all[best_class, iy, ix]
    types = np.where(chosen, SAO_EDGE, SAO_OFF).astype(np.int32)
    best_off = np.where(chosen[:, :, None], best_off, 0)
    best_class = np.where(chosen, best_class, 0)
    return types, best_class.astype(np.int32), best_off.astype(np.int32)


def sao_decide(src_planes, rec_planes, ctu_size_luma: int,
               qp: int) -> SaoFrameParams:
    """Vectorized SAO decision (uniform CTU grid fast path; falls back to the
    reference-style per-CTU loop otherwise)."""
    sy, su, sv = src_planes
    h, w = sy.shape[:2]
    cs = ctu_size_luma
    if h % cs == 0 and w % cs == 0:
        ry, ru, rv = rec_planes
        lam = T.rd_lambda(qp, "I")
        tl, el, ol = _decide_component_vec(np.asarray(sy), np.asarray(ry),
                                           cs, lam, 6)
        # chroma: shared type/class, joint cost over Cb+Cr
        dd_u, off_u = _eo_stats_vec(np.asarray(su), np.asarray(ru), cs // 2)
        dd_v, off_v = _eo_stats_vec(np.asarray(sv), np.asarray(rv), cs // 2)
        costc = (dd_u + dd_v
                 + lam * (8 + off_u.sum(axis=3) + off_v.sum(axis=3)))
        ec_best = costc.argmin(axis=0)
        gh, gw = ec_best.shape
        iy, ix = np.mgrid[0:gh, 0:gw]
        chosen_c = costc[ec_best, iy, ix] < lam * 1.0
        params = SaoFrameParams.alloc(gh, gw)
        params.type_luma[:] = tl
        params.eo_class_luma[:] = el
        params.offsets[:, :, 0] = ol
        params.type_chroma[:] = np.where(chosen_c, SAO_EDGE, SAO_OFF)
        params.eo_class_chroma[:] = np.where(chosen_c, ec_best, 0)
        params.offsets[:, :, 1] = np.where(chosen_c[:, :, None],
                                           off_u[ec_best, iy, ix], 0)
        params.offsets[:, :, 2] = np.where(chosen_c[:, :, None],
                                           off_v[ec_best, iy, ix], 0)
        # merge flags where params identical to neighbours
        def same_shift(ax, ay):
            ok = np.ones((gh, gw), bool)
            for arr in (params.type_luma, params.type_chroma,
                        params.eo_class_luma, params.eo_class_chroma):
                sh = np.roll(arr, (ay, ax), axis=(0, 1))
                ok &= arr == sh
            for arr in (params.band_pos, params.offsets):
                sh = np.roll(arr, (ay, ax), axis=(0, 1))
                ok &= (arr == sh).reshape(gh, gw, -1).all(axis=2)
            return ok
        left_same = same_shift(1, 0)
        left_same[:, 0] = False
        up_same = same_shift(0, 1)
        up_same[0, :] = False
        params.merge_left[:] = left_same
        params.merge_up[:] = (~left_same) & up_same
        return params
    return _sao_decide_loop(src_planes, rec_planes, ctu_size_luma, qp)


def _sao_decide_loop(src_planes, rec_planes, ctu_size_luma: int,
                     qp: int) -> SaoFrameParams:
    """Choose SAO parameters per CTU from (source, deblocked recon).
    Simple mode: evaluate 4 EO classes + BO per component; lambda-weighted
    rate estimate; merge flags when identical to neighbor params."""
    sy, su, sv = src_planes
    ry, ru, rv = rec_planes
    h, w = sy.shape
    cs = ctu_size_luma
    cy_n, cx_n = -(-h // cs), -(-w // cs)
    params = SaoFrameParams.alloc(cy_n, cx_n)
    lam = T.rd_lambda(qp, "I")
    cats_cache = {}

    def comp_cats(plane, ec, key):
        if (key, ec) not in cats_cache:
            cats_cache[(key, ec)] = _eo_categories(plane, ec)
        return cats_cache[(key, ec)]

    for cy in range(cy_n):
        for cx in range(cx_n):
            # ---- luma ----
            y0, x0 = cy * cs, cx * cs
            y1, x1 = min(y0 + cs, h), min(x0 + cs, w)
            sb = sy[y0:y1, x0:x1]
            rb = ry[y0:y1, x0:x1]
            best = (0.0 + lam * 1, SAO_OFF, 0, [0, 0, 0, 0])  # cost, type, class, off
            for ec in range(4):
                cat = comp_cats(ry, ec, 0)[y0:y1, x0:x1]
                diffs, counts = _stats_for_block(sb, rb, cat)
                offs, dd = [], 0
                for k, positive in ((1, True), (2, True), (3, False), (4, False)):
                    o, d2 = _best_offset(diffs[k], counts[k], positive=positive)
                    offs.append(abs(o))
                    dd += d2
                cost = dd + lam * (6 + sum(abs(o) for o in offs))
                if cost < best[0]:
                    best = (cost, SAO_EDGE, ec, offs)
            if best[1] != SAO_OFF:
                params.type_luma[cy, cx] = best[1]
                params.eo_class_luma[cy, cx] = best[2]
                params.offsets[cy, cx, 0] = best[3]
            # ---- chroma (shared type/class, separate offsets) ----
            cs2 = cs // 2
            yc0, xc0 = cy * cs2, cx * cs2
            yc1, xc1 = min(yc0 + cs2, h // 2), min(xc0 + cs2, w // 2)
            bestc = (0.0 + lam * 1, SAO_OFF, 0, None, None)
            for ec in range(4):
                catu = comp_cats(ru, ec, 1)[yc0:yc1, xc0:xc1]
                catv = comp_cats(rv, ec, 2)[yc0:yc1, xc0:xc1]
                du_, cu_ = _stats_for_block(su[yc0:yc1, xc0:xc1],
                                            ru[yc0:yc1, xc0:xc1], catu)
                dv_, cv_ = _stats_for_block(sv[yc0:yc1, xc0:xc1],
                                            rv[yc0:yc1, xc0:xc1], catv)
                dd = 0
                offu, offv = [], []
                for k, positive in ((1, True), (2, True), (3, False), (4, False)):
                    ou, d1 = _best_offset(du_[k], cu_[k], positive=positive)
                    ov, d2 = _best_offset(dv_[k], cv_[k], positive=positive)
                    offu.append(abs(ou)); offv.append(abs(ov))
                    dd += d1 + d2
                cost = dd + lam * (8 + sum(offu) + sum(offv))
                if cost < bestc[0]:
                    bestc = (cost, SAO_EDGE, ec, offu, offv)
            if bestc[1] != SAO_OFF:
                params.type_chroma[cy, cx] = bestc[1]
                params.eo_class_chroma[cy, cx] = bestc[2]
                params.offsets[cy, cx, 1] = bestc[3]
                params.offsets[cy, cx, 2] = bestc[4]
            # ---- merge flags when params identical to neighbors ----
            def same(ay, ax):
                return (params.type_luma[ay, ax] == params.type_luma[cy, cx]
                        and params.type_chroma[ay, ax] == params.type_chroma[cy, cx]
                        and params.eo_class_luma[ay, ax] == params.eo_class_luma[cy, cx]
                        and params.eo_class_chroma[ay, ax] == params.eo_class_chroma[cy, cx]
                        and np.array_equal(params.band_pos[ay, ax], params.band_pos[cy, cx])
                        and np.array_equal(params.offsets[ay, ax], params.offsets[cy, cx]))
            if cx > 0 and same(cy, cx - 1):
                params.merge_left[cy, cx] = True
            elif cy > 0 and same(cy - 1, cx):
                params.merge_up[cy, cx] = True
    return params
