"""TPU intra CU-tree encoder: two-pass (batched open-loop decision +
closed-loop CTB32 wavefront encode with fixed modes).

Pass 1 (decide): reference samples come from the SOURCE planes under the
real z-scan availability mask, so every block at every depth (32/16/8) is
independent — one fully-batched device pass: 35-mode SAD search + MPM
cost, TU pipeline at the chosen mode, integer RD cost, vectorized
bottom-up consolidation. Bit-identical to golden decide_intra_tree.

Pass 2 (encode): anti-diagonal wavefront over CTB32s (d = cx + 2*cy,
slot = cy — the diagonal-slot layout of engine/intra_encoder.py). The
scan body evaluates the 21-node hypothesis set per CTB (1 CU32 + 4 CU16
+ 16 CU8, each one predict_mode + TU pipeline — no mode search inside
the sequential scan) and selects per the decided tree, so refs always
come from the finally-selected reconstruction exactly as the golden
closed-loop encode produces them.

Reference analog: motion_intra CU-quadtree walk (hmr_motion_intra.c:
1759-1979) + consolidate_prediction_info (hmr_motion_inter.c:3372),
re-designed as decide-parallel / encode-lean instead of sequential RDO.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from homerhevc_tpu.config import EncoderConfig
from homerhevc_tpu.golden.intra_pred import _zorder_table
from homerhevc_tpu.golden.intra_tree import (
    COEF_BITS_NNZ, COEF_BITS_SUM, COEF_BITS_TU, CU_OVERHEAD_BITS,
    MODE_BITS_MPM, MODE_BITS_REM, SPLIT_BITS, TreeDecision)
from homerhevc_tpu.hevc import tables as T
from homerhevc_tpu.hevc.headers import ParamSets
from homerhevc_tpu.hevc.syntax import FrameDesc
from homerhevc_tpu.ops import intra as dip
from homerhevc_tpu.ops.quant import dequantize, quantize, sign_bit_hiding
from homerhevc_tpu.ops.transform import forward_transform, inverse_transform
from homerhevc_tpu.engine.intra_encoder import _mpm_jax

# z-order of sub-blocks within a quadrant / CTB
_QOFF = ((0, 0), (1, 0), (0, 1), (1, 1))


from homerhevc_tpu.ops.intra import avail_masks as _avail_masks  # noqa: E402
from homerhevc_tpu.ops.intra import seq_to_refs as _seq_to_refs  # noqa: E402


def _sh1(a):
    """Shift along the slot axis: out[s] = a[s-1], out[0] = 0."""
    return jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], axis=0)


def _scan_class(modes, n: int, is_luma: bool):
    log2n = n.bit_length() - 1
    if not (log2n == 2 or (log2n == 3 and is_luma)):
        return jnp.zeros_like(modes)
    ver = (modes >= 6) & (modes <= 14)
    hor = (modes >= 22) & (modes <= 30)
    return jnp.where(ver, 2, jnp.where(hor, 1, 0)).astype(jnp.int32)


class TpuIntraTreeEncoder:
    """Device twin of golden/intra_tree.py. One instance per geometry;
    QP is a traced input. Requires w % 32 == 0 and h % 32 == 0 and
    ctu_size in (32, 64)."""

    CTB = 32

    def __init__(self, ps: ParamSets, cfg: EncoderConfig):
        from homerhevc_tpu.utils.jaxcache import enable_compile_cache
        enable_compile_cache()
        self.ps = ps
        self.cfg = cfg
        w, h = cfg.width, cfg.height
        assert w % 32 == 0 and h % 32 == 0, "tree device path needs /32 dims"
        assert ps.ctu_size in (32, 64)
        self.w, self.h = w, h
        self.gw, self.gh = w // 32, h // 32     # CTB32 grid
        self.base_depth = ps.log2_ctu - 5
        from homerhevc_tpu.ops.pack import cg_cap, pack_capacity
        self.pack_C = pack_capacity(w * h * 3 // 2, max(0, cfg.qp - 4))
        self.cg_C = cg_cap(w * h * 3 // 2, max(0, cfg.qp - 4))
        self._build_static()
        self._decide_jit = jax.jit(self._decide_impl)
        self._encode_batch_jit = jax.jit(jax.vmap(self._frame_impl))
        wh = w * h

        def _packed(batch_u8, qps):
            y = batch_u8[:, :wh].reshape(-1, h, w)
            u = batch_u8[:, wh:wh + wh // 4].reshape(-1, h // 2, w // 2)
            v = batch_u8[:, wh + wh // 4:].reshape(-1, h // 2, w // 2)
            return jax.vmap(self._frame_impl)(y, u, v, qps)
        self._encode_packed_jit = jax.jit(_packed)

    # ---- static geometry --------------------------------------------------

    def _build_static(self):
        w, h, ctu = self.w, self.h, self.ps.ctu_size
        gw, gh = self.gw, self.gh

        # decision-pass availability masks per depth size (luma + chroma)
        self.dec_mask = {}
        for n in (32, 16, 8):
            gxs = np.arange(w // n) * n
            gys = np.arange(h // n) * n
            self.dec_mask[n] = _avail_masks(
                w, h, ctu, n, 0, gxs[None, :], gys[:, None])
            nc = n // 2
            cxs = np.arange((w // 2) // nc) * nc
            cys = np.arange((h // 2) // nc) * nc
            self.dec_mask[(n, "c")] = _avail_masks(
                w, h, ctu, nc, 1, cxs[None, :], cys[:, None])

        # encode-pass wavefront layout over CTB32s (slot = cy)
        ndiag = (gw - 1) + 2 * (gh - 1) + 1
        self.ndiag = ndiag
        sl = np.arange(gh)[None, :]
        dd = np.arange(ndiag)[:, None]
        d_gx = dd - 2 * sl
        d_valid = (d_gx >= 0) & (d_gx < gw)
        gx_c = np.clip(d_gx, 0, gw - 1)
        gy_b = np.broadcast_to(sl, d_gx.shape)
        self.d_valid = d_valid
        self.d_flat = np.where(d_valid, gy_b * gw + gx_c, gh * gw) \
            .astype(np.int32)

        # per-node availability masks gathered into the (ndiag, gh) layout
        ctb_x = gx_c * 32
        ctb_y = gy_b * 32

        def node_mask(lx, ly, n, chroma):
            if chroma:
                m = _avail_masks(w, h, ctu, n, 1,
                                 (ctb_x // 2) + lx, (ctb_y // 2) + ly)
            else:
                m = _avail_masks(w, h, ctu, n, 0, ctb_x + lx, ctb_y + ly)
            return np.where(d_valid[..., None], m, False)
        self.m32 = node_mask(0, 0, 32, False)
        self.m32c = node_mask(0, 0, 16, True)
        self.m16 = np.stack([node_mask(16 * qx, 16 * qy, 16, False)
                             for qx, qy in _QOFF])
        self.m16c = np.stack([node_mask(8 * qx, 8 * qy, 8, True)
                              for qx, qy in _QOFF])
        m8, m8c = [], []
        for qx, qy in _QOFF:
            for sx, sy in _QOFF:
                m8.append(node_mask(16 * qx + 8 * sx, 16 * qy + 8 * sy,
                                    8, False))
                m8c.append(node_mask(8 * qx + 4 * sx, 8 * qy + 4 * sy,
                                     4, True))
        self.m8 = np.stack(m8)
        self.m8c = np.stack(m8c)

    # ---- decision pass (open loop, fully batched) -------------------------

    def _gather_refs(self, plane, n):
        """(gh, gw, 4n+1) substitution-order raw samples for every n-block
        of `plane` (pre-mask). Shared impl: ops/intra.py gather_ref_seq."""
        return dip.gather_ref_seq(plane, n)

    def _tu_eval(self, src_blk, pred, n, qp, scan_sel, is_luma):
        """T->Q->(SBH)->IQ->IT; returns (ssd, coef_bits, lvl, rec),
        batched over leading dim."""
        sl = self.ps.scaling_list_enabled
        resid = src_blk - pred
        coef = forward_transform(resid, False)
        lvl = quantize(coef, n, qp, True, sl)
        if self.ps.sign_hiding:
            lvl = self._sbh(lvl, coef, n, qp, scan_sel, is_luma)
        deq = dequantize(lvl, n, qp, True, sl)
        rres = inverse_transform(deq, False)
        any_nz = jnp.any(lvl != 0, axis=(-1, -2))
        rec = jnp.where(any_nz[..., None, None],
                        jnp.clip(pred + rres, 0, 255), pred)
        d = rec - src_blk
        ssd = jnp.sum(d * d, axis=(-1, -2)).astype(jnp.int32)
        nnz = jnp.sum((lvl != 0).astype(jnp.int32), axis=(-1, -2))
        sabs = jnp.sum(jnp.abs(lvl), axis=(-1, -2)).astype(jnp.int32)
        cbits = jnp.where(nnz > 0,
                          COEF_BITS_NNZ * nnz + COEF_BITS_SUM * sabs
                          + COEF_BITS_TU, 0)
        return ssd, cbits, lvl, rec

    def _sbh(self, lvl, coef, n, qp, scan_sel, is_luma):
        log2n = n.bit_length() - 1
        sl = self.ps.scaling_list_enabled
        if not (log2n == 2 or (log2n == 3 and is_luma)):
            return sign_bit_hiding(lvl, coef, n, qp, True, 0, sl)
        out = lvl
        for s in (0, 1, 2):
            adj = sign_bit_hiding(lvl, coef, n, qp, True, s, sl)
            out = jnp.where((scan_sel == s)[..., None, None], adj, out)
        return out

    def _decide_impl(self, src_y, src_u, src_v, qp):
        """Device twin of golden decide_intra_tree. Returns (depth8,
        mode8) int32 maps at 8x8-unit granularity."""
        ps = self.ps
        w, h = self.w, self.h
        qp_c = jnp.asarray(T.CHROMA_QP_MAP)[
            jnp.clip(qp + ps.cb_qp_offset, 0, 57)]
        lam = jnp.asarray(
            np.asarray([T.lambda_int(q, "I") for q in range(52)], np.int32)
        )[qp]
        bits_tab = np.asarray(
            [T.intra_mode_bits(q) for q in range(52)], np.int32)
        bits_mpm = jnp.asarray(bits_tab[:, 0])[qp]
        bits_rem = jnp.asarray(bits_tab[:, 1])[qp]

        costs, modes = {}, {}
        for n in (32, 16, 8):
            gh, gw = h // n, w // n
            B = gh * gw
            seq = self._gather_refs(src_y, n).reshape(B, 4 * n + 1)
            mask = jnp.asarray(self.dec_mask[n]).reshape(B, 4 * n + 1)
            seq = dip.substitute_refs(seq, mask)
            top, left = _seq_to_refs(seq, n)
            preds = dip.predict_all_modes(top, left, n, True)
            preds = dip.edge_fixes(preds, top, left, n, True)
            src_blk = src_y.reshape(gh, n, gw, n).transpose(0, 2, 1, 3) \
                .reshape(B, n, n).astype(jnp.int32)
            sad = jnp.sum(jnp.abs(src_blk[:, None] - preds),
                          axis=(-1, -2)).astype(jnp.int32)
            pre = jnp.argmin(sad, axis=-1).astype(jnp.int32).reshape(gh, gw)
            # MPM from neighbor pre-modes (left always-coded; above gated
            # to the same CTU row)
            left_m = jnp.concatenate(
                [jnp.ones((gh, 1), jnp.int32), pre[:, :-1]], axis=1)
            above_m = jnp.concatenate(
                [jnp.ones((1, gw), jnp.int32), pre[:-1]], axis=0)
            same_row = (np.arange(gh) * n % ps.ctu_size) != 0
            above_m = jnp.where(jnp.asarray(same_row)[:, None], above_m, 1)
            mpm = _mpm_jax(left_m.reshape(-1), above_m.reshape(-1))
            in_mpm = jnp.any(
                jnp.arange(35)[None, :, None] == mpm[:, None, :], axis=-1)
            mcost = sad + jnp.where(in_mpm, bits_mpm, bits_rem)
            mode = jnp.argmin(mcost, axis=-1).astype(jnp.int32)
            pred = jnp.take_along_axis(
                preds, mode[:, None, None, None], axis=1)[:, 0]
            ssd, cbits, _, _ = self._tu_eval(
                src_blk, pred, n, qp, _scan_class(mode, n, True), True)
            # chroma (DM) rides along
            nc = n // 2
            for plane, key in ((src_u, "c"), (src_v, "c")):
                cseq = self._gather_refs(plane, nc).reshape(B, 4 * nc + 1)
                cmask = jnp.asarray(self.dec_mask[(n, "c")]) \
                    .reshape(B, 4 * nc + 1)
                cseq = dip.substitute_refs(cseq, cmask)
                ctop, cleft = _seq_to_refs(cseq, nc)
                cpred = dip.predict_mode(ctop, cleft, nc, mode, False)
                cblk = plane.reshape(gh, nc, gw, nc).transpose(0, 2, 1, 3) \
                    .reshape(B, nc, nc).astype(jnp.int32)
                cssd, ccbits, _, _ = self._tu_eval(
                    cblk, cpred, nc, qp_c, _scan_class(mode, nc, False),
                    False)
                ssd = ssd + cssd
                cbits = cbits + ccbits
            sel_mpm = jnp.take_along_axis(in_mpm, mode[:, None], axis=1)[:, 0]
            mode_bits = jnp.where(sel_mpm, MODE_BITS_MPM, MODE_BITS_REM)
            cost = ssd + lam * (cbits + mode_bits + CU_OVERHEAD_BITS)
            costs[n] = cost.reshape(gh, gw)
            modes[n] = mode.reshape(gh, gw)

        # bottom-up consolidation (split iff children strictly cheaper)
        def q4(a):
            return a[0::2, 0::2] + a[0::2, 1::2] + a[1::2, 0::2] + a[1::2, 1::2]
        csum16 = q4(costs[8]) + lam * SPLIT_BITS
        split16 = csum16 < costs[16]
        best16 = jnp.where(split16, csum16, costs[16])
        csum32 = q4(best16) + lam * SPLIT_BITS
        split32 = csum32 < costs[32]

        def rep(a, r):
            return jnp.repeat(jnp.repeat(a, r, axis=0), r, axis=1)
        s32u = rep(split32, 4)
        s16u = rep(split16, 2)
        depth8 = jnp.where(~s32u, 0, jnp.where(~s16u, 1, 2)) \
            .astype(jnp.int32) + self.base_depth
        mode8 = jnp.where(~s32u, rep(modes[32], 4),
                          jnp.where(~s16u, rep(modes[16], 2), modes[8])) \
            .astype(jnp.int32)
        return depth8, mode8

    # ---- encode pass (closed-loop CTB32 wavefront) ------------------------

    def _node(self, ybuf, t_ext, l_ext, lx, ly, n, mask, mode_vec, src_tile,
              qp, is_luma):
        """One hypothesis node: refs from the tile/carry, single-mode
        prediction, TU pipeline. Returns (lvl, rec) each (gh, n, n)."""
        n2 = 2 * n
        tile_h = ybuf.shape[1]
        if lx == 0:
            col = l_ext[:, 1 + ly:1 + ly + n2]
            if col.shape[1] < n2:
                col = jnp.pad(col, ((0, 0), (0, n2 - col.shape[1])))
        else:
            col = ybuf[:, ly:ly + n2, lx - 1]
        left_bt = col[:, ::-1]
        if lx == 0 and ly == 0:
            corner = t_ext[:, 0:1]
        elif ly == 0:
            corner = t_ext[:, lx:lx + 1]
        elif lx == 0:
            corner = l_ext[:, ly:ly + 1]
        else:
            corner = ybuf[:, ly - 1, lx - 1:lx]
        if ly == 0:
            toprow = t_ext[:, 1 + lx:1 + lx + n2]
        else:
            toprow = ybuf[:, ly - 1, lx:lx + n2]
        seq = jnp.concatenate([left_bt, corner, toprow], axis=1)
        seq = dip.substitute_refs(seq, mask)
        top, left = _seq_to_refs(seq, n)
        pred = dip.predict_mode(top, left, n, mode_vec, is_luma)
        src_blk = src_tile[:, ly:ly + n, lx:lx + n].astype(jnp.int32)
        _, _, lvl, rec = self._tu_eval(
            src_blk, pred, n, qp, _scan_class(mode_vec, n, is_luma), is_luma)
        return lvl, rec

    def _frame_impl(self, src_y, src_u, src_v, qp):
        ps = self.ps
        gw, gh, ndiag = self.gw, self.gh, self.ndiag
        qp = qp.astype(jnp.int32)
        qp_c = jnp.asarray(T.CHROMA_QP_MAP)[
            jnp.clip(qp + ps.cb_qp_offset, 0, 57)]
        depth8, mode8 = self._decide_impl(src_y, src_u, src_v, qp)

        # gather per-diagonal inputs (sources + decision maps)
        def diag_blocks(plane, n):
            hh, ww = plane.shape
            b = plane.reshape(hh // n, n, ww // n, n).transpose(0, 2, 1, 3) \
                .reshape(-1, n, n)
            b = jnp.concatenate([b, jnp.zeros((1, n, n), b.dtype)], axis=0)
            return b[jnp.asarray(self.d_flat)]          # (ndiag, gh, n, n)
        by = diag_blocks(src_y, 32)
        bu = diag_blocks(src_u, 16)
        bv = diag_blocks(src_v, 16)
        dep_units = diag_blocks(depth8, 4)               # (ndiag, gh, 4, 4)
        mode_units = diag_blocks(mode8, 4)
        m32_all = jnp.asarray(self.m32)
        m32c_all = jnp.asarray(self.m32c)
        m16_all = jnp.asarray(self.m16)                  # (4, ndiag, gh, 65)
        m16c_all = jnp.asarray(self.m16c)
        m8_all = jnp.asarray(self.m8)                    # (16, ndiag, gh, 33)
        m8c_all = jnp.asarray(self.m8c)

        def body(carry, xs):
            (p1b, p1r, p2b, p3b,
             p1b_u, p1r_u, p2b_u, p3b_u,
             p1b_v, p1r_v, p2b_v, p3b_v) = carry
            (sy, su, sv, dep, mod, mk32, mk32c, mk16, mk16c, mk8,
             mk8c) = xs
            # external refs (carry boundaries; same wiring as the uniform
            # wavefront but CTB32-wide)
            def exts(p1b_, p1r_, p2b_, p3b_, n):
                corner = _sh1(p3b_)[:, -1:]
                t_ext = jnp.concatenate(
                    [corner, _sh1(p2b_), _sh1(p1b_)], axis=1)  # (gh, 2n+1)
                l_ext = jnp.concatenate([corner, p1r_], axis=1)
                return t_ext, l_ext
            t_y, l_y = exts(p1b, p1r, p2b, p3b, 32)
            t_u, l_u = exts(p1b_u, p1r_u, p2b_u, p3b_u, 16)
            t_v, l_v = exts(p1b_v, p1r_v, p2b_v, p3b_v, 16)

            # working tiles (48-wide/high: interior 32 + masked slack for
            # top-right / below-left reads)
            yb = jnp.zeros((gh, 48, 48), jnp.int32)
            ub = jnp.zeros((gh, 24, 24), jnp.int32)
            vb = jnp.zeros((gh, 24, 24), jnp.int32)
            lyb = jnp.zeros((gh, 32, 32), jnp.int32)
            lub = jnp.zeros((gh, 16, 16), jnp.int32)
            lvb = jnp.zeros((gh, 16, 16), jnp.int32)

            m32v = mod[:, 0, 0]
            # CU32 hypothesis (reads only external refs)
            lvl32, rec32 = self._node(yb, t_y, l_y, 0, 0, 32, mk32, m32v,
                                      sy, qp, True)
            lvl32u, rec32u = self._node(ub, t_u, l_u, 0, 0, 16, mk32c, m32v,
                                        su, qp_c, False)
            lvl32v, rec32v = self._node(vb, t_v, l_v, 0, 0, 16, mk32c, m32v,
                                        sv, qp_c, False)

            for q, (qx, qy) in enumerate(_QOFF):
                ox, oy = 16 * qx, 16 * qy
                m16v = mod[:, 2 * qy, 2 * qx]
                qdep = dep[:, 2 * qy, 2 * qx]
                lvl16, rec16 = self._node(yb, t_y, l_y, ox, oy, 16,
                                          mk16[q], m16v, sy, qp, True)
                lvl16u, rec16u = self._node(ub, t_u, l_u, ox // 2, oy // 2,
                                            8, mk16c[q], m16v, su, qp_c,
                                            False)
                lvl16v, rec16v = self._node(vb, t_v, l_v, ox // 2, oy // 2,
                                            8, mk16c[q], m16v, sv, qp_c,
                                            False)
                l8t = jnp.zeros((gh, 16, 16), jnp.int32)
                l8tu = jnp.zeros((gh, 8, 8), jnp.int32)
                l8tv = jnp.zeros((gh, 8, 8), jnp.int32)
                for k, (sx, sy8) in enumerate(_QOFF):
                    lx, ly = ox + 8 * sx, oy + 8 * sy8
                    ni = 4 * q + k
                    m8v = mod[:, ly // 8, lx // 8]
                    lvl8, rec8 = self._node(yb, t_y, l_y, lx, ly, 8,
                                            mk8[ni], m8v, sy, qp, True)
                    yb = yb.at[:, ly:ly + 8, lx:lx + 8].set(rec8)
                    l8t = l8t.at[:, 8 * sy8:8 * sy8 + 8,
                                 8 * sx:8 * sx + 8].set(lvl8)
                    lvl8u, rec8u = self._node(ub, t_u, l_u, lx // 2,
                                              ly // 2, 4, mk8c[ni], m8v,
                                              su, qp_c, False)
                    ub = ub.at[:, ly // 2:ly // 2 + 4,
                               lx // 2:lx // 2 + 4].set(rec8u)
                    l8tu = l8tu.at[:, 4 * sy8:4 * sy8 + 4,
                                   4 * sx:4 * sx + 4].set(lvl8u)
                    lvl8v, rec8v = self._node(vb, t_v, l_v, lx // 2,
                                              ly // 2, 4, mk8c[ni], m8v,
                                              sv, qp_c, False)
                    vb = vb.at[:, ly // 2:ly // 2 + 4,
                               lx // 2:lx // 2 + 4].set(rec8v)
                    l8tv = l8tv.at[:, 4 * sy8:4 * sy8 + 4,
                                   4 * sx:4 * sx + 4].set(lvl8v)
                # quadrant selection (depth==1 => whole CU16)
                is16 = (qdep <= self.base_depth + 1)[:, None, None]
                selq = jnp.where(is16, rec16, yb[:, oy:oy + 16, ox:ox + 16])
                yb = yb.at[:, oy:oy + 16, ox:ox + 16].set(selq)
                lyb = lyb.at[:, oy:oy + 16, ox:ox + 16].set(
                    jnp.where(is16, lvl16, l8t))
                sub = jnp.where(is16, rec16u,
                                ub[:, oy // 2:oy // 2 + 8,
                                   ox // 2:ox // 2 + 8])
                ub = ub.at[:, oy // 2:oy // 2 + 8, ox // 2:ox // 2 + 8] \
                    .set(sub)
                lub = lub.at[:, oy // 2:oy // 2 + 8, ox // 2:ox // 2 + 8] \
                    .set(jnp.where(is16, lvl16u, l8tu))
                svb = jnp.where(is16, rec16v,
                                vb[:, oy // 2:oy // 2 + 8,
                                   ox // 2:ox // 2 + 8])
                vb = vb.at[:, oy // 2:oy // 2 + 8, ox // 2:ox // 2 + 8] \
                    .set(svb)
                lvb = lvb.at[:, oy // 2:oy // 2 + 8, ox // 2:ox // 2 + 8] \
                    .set(jnp.where(is16, lvl16v, l8tv))

            is32 = (dep[:, 0, 0] == self.base_depth)[:, None, None]
            rec_f = jnp.where(is32, rec32, yb[:, :32, :32])
            rec_fu = jnp.where(is32, rec32u, ub[:, :16, :16])
            rec_fv = jnp.where(is32, rec32v, vb[:, :16, :16])
            lvl_f = jnp.where(is32, lvl32, lyb)
            lvl_fu = jnp.where(is32, lvl32u, lub)
            lvl_fv = jnp.where(is32, lvl32v, lvb)

            carry = (rec_f[:, -1, :], rec_f[:, :, -1], p1b, p2b,
                     rec_fu[:, -1, :], rec_fu[:, :, -1], p1b_u, p2b_u,
                     rec_fv[:, -1, :], rec_fv[:, :, -1], p1b_v, p2b_v)
            return carry, (rec_f, rec_fu, rec_fv, lvl_f, lvl_fu, lvl_fv)

        zs = lambda n: jnp.zeros((gh, n), jnp.int32)
        carry0 = (zs(32), zs(32), zs(32), zs(32),
                  zs(16), zs(16), zs(16), zs(16),
                  zs(16), zs(16), zs(16), zs(16))
        xs = (by, bu, bv, dep_units, mode_units,
              m32_all, m32c_all,
              jnp.moveaxis(m16_all, 0, 1), jnp.moveaxis(m16c_all, 0, 1),
              jnp.moveaxis(m8_all, 0, 1), jnp.moveaxis(m8c_all, 0, 1))
        _, outs = jax.lax.scan(body, carry0, xs)
        rec, rec_u, rec_v, lvl, lvl_u, lvl_v = outs

        flat_idx = jnp.asarray(self.d_flat)

        def assemble(blocks, n, hh, ww):
            buf = jnp.zeros((gh * gw + 1, n, n), blocks.dtype)
            buf = buf.at[flat_idx.reshape(-1)].set(
                blocks.reshape(-1, n, n), mode="drop")
            return buf[:gh * gw].reshape(gh, gw, n, n) \
                .transpose(0, 2, 1, 3).reshape(hh, ww)
        w, h = self.w, self.h
        recon_y = assemble(rec.astype(jnp.uint8), 32, h, w)
        recon_u = assemble(rec_u.astype(jnp.uint8), 16, h // 2, w // 2)
        recon_v = assemble(rec_v.astype(jnp.uint8), 16, h // 2, w // 2)
        if ps.deblocking_enabled:
            # in-loop deblock over the DECIDED maps: BS=2 on every TU edge
            # of the 8-grid (golden twin: deblock.intra_bs_maps +
            # deblock_plane_luma/chroma; tr_depth==0 on this path so the
            # TU size is the CU size)
            from homerhevc_tpu.ops.deblock import (deblock_chroma_bs,
                                                   deblock_luma_bs)
            h8u, w8u = h // 8, w // 8
            tu8 = (ps.ctu_size >> depth8).astype(jnp.int32)
            ux8 = jnp.arange(w8u, dtype=jnp.int32) * 8
            uy8 = jnp.arange(h8u, dtype=jnp.int32) * 8
            bs_v = jnp.where((ux8[None, :] % tu8) == 0, 2, 0) \
                .at[:, 0].set(0)
            bs_h = jnp.where((uy8[:, None] % tu8) == 0, 2, 0) \
                .at[0, :].set(0)
            recon_y = deblock_luma_bs(recon_y.astype(jnp.int32),
                                      bs_v, bs_h, qp).astype(jnp.uint8)
            recon_u = deblock_chroma_bs(recon_u, bs_v == 2, bs_h == 2, qp,
                                        ps.cb_qp_offset).astype(jnp.uint8)
            recon_v = deblock_chroma_bs(recon_v, bs_v == 2, bs_h == 2, qp,
                                        ps.cr_qp_offset).astype(jnp.uint8)
        # device SAO decide+apply (same program as the inter path; keeps
        # the recon device-resident for the following P chain and replaces
        # the ~4 s/frame host sao_decide at 1080p)
        sao_vec = None
        if ps.sao_enabled:
            from homerhevc_tpu.ops.sao_dev import (pack_params,
                                                   sao_analyze_apply)
            lam_x256 = (jnp.asarray(T.RD_LAMBDA_I_TAB)[qp] * 256.0 + 0.5) \
                .astype(jnp.int32)
            ry_f, ru_f, rv_f, sparams = sao_analyze_apply(
                src_y.astype(jnp.int32), src_u.astype(jnp.int32),
                src_v.astype(jnp.int32), recon_y.astype(jnp.int32),
                recon_u.astype(jnp.int32), recon_v.astype(jnp.int32),
                ps.ctu_size, lam_x256)
            recon_y = ry_f.astype(jnp.uint8)
            recon_u = ru_f.astype(jnp.uint8)
            recon_v = rv_f.astype(jnp.uint8)
            sao_vec = pack_params(sparams)
        ly = assemble(lvl.astype(jnp.int16), 32, h, w)
        lu = assemble(lvl_u.astype(jnp.int16), 16, h // 2, w // 2)
        lv = assemble(lvl_v.astype(jnp.int16), 16, h // 2, w // 2)
        from homerhevc_tpu.ops.pack import pack_sparse_cg
        cg_bitmap, masks16, codes, esc_idx, esc_val, count, esc_count, \
            cg_count = pack_sparse_cg([ly, lu, lv], self.pack_C, self.cg_C)

        def u8(a):
            if a.dtype == jnp.uint8:
                return a.reshape(-1)
            return jax.lax.bitcast_convert_type(a, jnp.uint8).reshape(-1)
        meta = jnp.concatenate(
            [depth8.astype(jnp.uint8).reshape(-1),
             mode8.astype(jnp.uint8).reshape(-1)]
            + ([sao_vec] if sao_vec is not None else [])
            + [cg_bitmap,
               u8(masks16), codes, u8(esc_idx), u8(esc_val),
               u8(count.reshape(1)), u8(esc_count.reshape(1)),
               u8(cg_count.reshape(1))])
        return recon_y, recon_u, recon_v, ly, lu, lv, meta

    # ---- host glue (mirrors TpuIntraEncoder) ------------------------------

    def _build_desc(self, depth8, mode8, ly, lu, lv):
        desc = FrameDesc.alloc(self.w, self.h)
        desc.cu_depth[:] = depth8
        desc.tr_depth[:] = 0
        desc.luma_mode[:] = np.repeat(np.repeat(mode8, 2, 0), 2, 1)
        desc.chroma_mode[:] = mode8
        if ly is None:      # wire-direct: caller attaches desc.cg_wire
            desc.coef_y = desc.coef_u = desc.coef_v = None
        else:
            desc.coef_y = np.ascontiguousarray(ly, np.int16)
            desc.coef_u = np.ascontiguousarray(lu, np.int16)
            desc.coef_v = np.ascontiguousarray(lv, np.int16)
        return desc

    def decide(self, y, u, v, qp: int) -> TreeDecision:
        """Host helper: run only the decision pass (tests)."""
        f = self._decide_jit
        d8, m8 = f(jnp.asarray(np.asarray(y, np.uint8)),
                   jnp.asarray(np.asarray(u, np.uint8)),
                   jnp.asarray(np.asarray(v, np.uint8)),
                   jnp.asarray(qp, jnp.int32))
        d8 = np.asarray(d8).astype(np.uint8)
        m8 = np.asarray(m8).astype(np.uint8)
        return TreeDecision(depth8=d8, mode8=m8, chroma8=m8.copy())

    def encode_frame(self, y, u, v, qp: int, qp_map=None):
        assert qp_map is None, "AQ runs on the CU16 path, not the tree"
        return self.encode_frames([y], [u], [v], qps=[qp])[0]

    def pack_upload(self, frames):
        F = len(frames)
        n_tot = self.w * self.h * 3 // 2
        packed = np.empty((F, n_tot), np.uint8)
        wh = self.w * self.h
        for i, (y, u, v) in enumerate(frames):
            packed[i, :wh] = np.asarray(y, np.uint8).reshape(-1)
            packed[i, wh:wh + wh // 4] = np.asarray(u, np.uint8).reshape(-1)
            packed[i, wh + wh // 4:] = np.asarray(v, np.uint8).reshape(-1)
        return jax.device_put(packed)

    def dispatch_packed(self, handle, qps, qp_maps=None):
        assert qp_maps is None, "AQ runs on the CU16 path, not the tree"
        qp_arr = jnp.asarray(np.asarray(qps, np.int32))
        out = self._encode_packed_jit(handle, qp_arr)
        try:
            out[6].copy_to_host_async()
        except Exception:
            pass
        return out

    def dispatch_frames(self, ys, us, vs, qps=None):
        if qps is None:
            qps = [self.cfg.qp] * len(ys)
        handle = ys if isinstance(ys, jax.Array) \
            else self.pack_upload(list(zip(ys, us, vs)))
        return self.dispatch_packed(handle, qps)

    def fetch_frames(self, out, n_frames: int, qp_maps=None):
        from homerhevc_tpu.ops.pack import esc_capacity
        from homerhevc_tpu.engine.intra_encoder import (
            _DeviceSlice, _parse_cg_wire, _unpack_cg_frame, _wire_frame)
        from homerhevc_tpu.utils.profiler import PROFILER
        ry, ru, rv, ly, lu, lv, meta = out
        with PROFILER.scope("fetch_meta"):
            meta_np = np.asarray(meta)
        h8, w8 = self.h // 8, self.w // 8
        ng = h8 * w8
        n_tot = self.w * self.h * 3 // 2
        E = esc_capacity(n_tot, self.pack_C)
        depth8s = meta_np[:, :ng].reshape(n_frames, h8, w8)
        mode8s = meta_np[:, ng:2 * ng].reshape(n_frames, h8, w8)
        off = 2 * ng
        sao_bufs = None
        if self.ps.sao_enabled:
            from homerhevc_tpu.ops.sao_dev import params_nbytes
            sgh = self.h // self.ps.ctu_size
            sgw = self.w // self.ps.ctu_size
            nb = params_nbytes(sgh, sgw)
            sao_bufs = meta_np[:, off:off + nb]
            off += nb
        wire = _parse_cg_wire(meta_np, off, n_tot, self.pack_C,
                              self.cg_C, E)
        shapes = [(self.h, self.w), (self.h // 2, self.w // 2),
                  (self.h // 2, self.w // 2)]
        results = []
        with PROFILER.scope("fetch_unpack"):
            for i in range(n_frames):
                w8 = _wire_frame(wire, i, shapes)
                if w8 is not None:
                    desc = self._build_desc(depth8s[i], mode8s[i],
                                            None, None, None)
                    desc.cg_wire = w8
                else:
                    py, pu, pv = _unpack_cg_frame(
                        wire, i, n_tot, shapes,
                        lambda: (np.asarray(ly[i]), np.asarray(lu[i]),
                                 np.asarray(lv[i])))
                    desc = self._build_desc(depth8s[i], mode8s[i],
                                            py, pu, pv)
                if sao_bufs is not None:
                    from homerhevc_tpu.ops.sao_dev import unpack_params
                    desc.sao_params = unpack_params(sao_bufs[i], sgh, sgw)
                results.append((desc, _DeviceSlice(ry, i),
                                _DeviceSlice(ru, i), _DeviceSlice(rv, i)))
        return results

    def encode_frames(self, ys, us, vs, qps=None):
        return self.fetch_frames(self.dispatch_frames(ys, us, vs, qps=qps),
                                 len(ys))
