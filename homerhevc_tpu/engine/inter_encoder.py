"""TPU P-frame encoder: batched windowed full-search ME + MC + residual
pipeline for ALL CUs of the frame in one device program (P frames carry no
intra-frame dependency in this design, so there is no wavefront — the entire
frame is one batch; SURVEY.md §7 step 7 done the TPU way).

Bit-exact to golden/inter_frame.py (tests/test_tpu_inter.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from homerhevc_tpu.config import EncoderConfig
from homerhevc_tpu.hevc import tables as T
from homerhevc_tpu.hevc.headers import ParamSets
from homerhevc_tpu.hevc.syntax import FrameDesc, MODE_INTER
from homerhevc_tpu.golden.inter_frame import select_inter_syntax
from homerhevc_tpu.ops.quant import dequantize, quantize, sign_bit_hiding
from homerhevc_tpu.ops.transform import forward_transform, inverse_transform


def select_intra_independent_j(want: jnp.ndarray) -> jnp.ndarray:
    """Device twin of golden select_intra_independent (king-graph 4-class
    sweep; identical arithmetic)."""
    gh, gw = want.shape
    gy = (jnp.arange(gh) & 1)[:, None]
    gx = (jnp.arange(gw) & 1)[None, :]
    sel = jnp.zeros_like(want)
    for cy, cx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        p = jnp.pad(sel, 1)
        blocked = (p[:-2, :-2] | p[:-2, 1:-1] | p[:-2, 2:]
                   | p[1:-1, :-2] | p[1:-1, 2:]
                   | p[2:, :-2] | p[2:, 1:-1] | p[2:, 2:])
        sel = sel | (want & (gy == cy) & (gx == cx) & ~blocked)
    return sel


class TpuInterEncoder:
    def __init__(self, ps: ParamSets, cfg: EncoderConfig, cu: int = 16,
                 search: int = 16):
        from homerhevc_tpu.utils.jaxcache import enable_compile_cache
        enable_compile_cache()
        self.ps = ps
        self.cfg = cfg
        self.cu = cu
        self.search = search
        self.w, self.h = cfg.width, cfg.height
        assert self.w % cu == 0 and self.h % cu == 0
        # performance modes on the DEVICE programs (reference
        # hmr_encoder_lib.c:921-947): FAST (>=1) drops the merge-RD
        # re-code stage and masks the CU32/CU64 consolidation with the
        # golden fast-skip predicate (mv_spread > 16); UFAST (>=2) also
        # skips the CU64 layer — the compiled program genuinely shrinks,
        # so -performance_mode changes the measured device fps
        self.perf = int(getattr(cfg, "performance_mode", 0))
        # batched merge-RD stage on the flat CU16 program (golden twin:
        # merge_rd_fast)
        self.merge_rd = (bool(getattr(cfg, "merge_rd_device", True))
                         and self.perf == 0)
        # FAR (4x-decimated) pyramid level beyond the 2x sweep's +-2*search
        # reach (golden twin: far_grid / hier_pel_fields far block); reach =
        # the maximum full-pel roam of any ME candidate (sets ref padding)
        self.far = cfg.me_range if cfg.me_range > max(32, 2 * search) else 0
        # FAR centers reach +-(far+4); their +-2 neighbourhoods +-(far+6)
        self.reach = max(2 * search + 2, self.far + 8)
        self.gw, self.gh = self.w // cu, self.h // cu
        # multi-level CU tree: CU32 over CU16 at CTB32; CTB64 adds the
        # CU64 level (luma as four forced-split TU32s, golden twin:
        # encode_inter_frame_tree want64)
        self.tree = ps.ctu_size in (32, 64)
        # UFAST raises min CU depth (golden want64=False twin)
        self.tree64 = ps.ctu_size == 64 and self.perf < 2
        if self.tree64:
            assert self.w % 64 == 0 and self.h % 64 == 0, \
                "device CTB64 path needs /64 dims (use golden otherwise)"
        self.gw2, self.gh2 = self.w // 32, self.h // 32
        self.gw4, self.gh4 = self.w // 64, self.h // 64
        # QP is a traced input of the device programs (one compile serves
        # every QP — the CBR/VBR requirement); only the wire capacity is
        # sized from the nominal cfg QP (with RC-dip headroom)
        from homerhevc_tpu.ops.pack import cg_cap, pack_capacity
        n_tot = self.w * self.h * 3 // 2
        self.pack_C = pack_capacity(n_tot, max(0, cfg.qp - 4))
        self.cg_C = cg_cap(n_tot, max(0, cfg.qp - 4))
        if cfg.intra_in_p:
            # static z-scan ADI availability for the CU16 fallback grid
            from homerhevc_tpu.ops.intra import avail_masks
            gxs = np.arange(self.w // 16) * 16
            gys = np.arange(self.h // 16) * 16
            self.if_mask = avail_masks(self.w, self.h, ps.ctu_size, 16, 0,
                                       gxs[None, :], gys[:, None])
            cxs = np.arange(self.w // 16) * 8
            cys = np.arange(self.h // 16) * 8
            self.if_mask_c = avail_masks(self.w, self.h, ps.ctu_size, 8, 1,
                                         cxs[None, :], cys[:, None])
        self._jit = jax.jit(self._impl)

    def _hier_me(self, sy, ry, lam16):
        """Hierarchical shortlist full-pel ME vs one reference plane
        (golden twin: hier_pel_fields). lam16: traced or static int32
        SAD-domain lambda. Returns (mvs (B,2) qpel, prior, mv32 (B2,2)
        qpel or None, prior2 or None)."""
        cu = self.cu
        gw, gh = self.gw, self.gh
        R = self.search
        # (see golden hier_pel_fields for the search structure)
        # Mirrors golden.inter_frame.hier_pel_fields bit-exactly, built ONLY
        # from whole-plane shifts (per-block patch gathers serialize on TPU):
        # a 2x decimated sweep covers +-2R full-res pels at 1/4 the HBM
        # traffic; per-block top-K votes elect G global offsets; full-res
        # SADs for the +-2 neighbourhood of each + an exact +-4 fine sweep
        # are shifted-plane block sums shared by the 16- and 32-level trees.
        side = 2 * R + 1
        mvd_bits = jnp.asarray(T.MVD_BITS)
        K, G16, G32 = 3, 8, 4

        def decim(p):
            h2, w2 = (p.shape[0] // 2) * 2, (p.shape[1] // 2) * 2
            q = p[:h2, :w2]
            return (q[0::2, 0::2] + q[1::2, 0::2]
                    + q[0::2, 1::2] + q[1::2, 1::2] + 2) >> 2

        m = cu // 2
        sd16 = decim(sy).astype(jnp.int16)                  # (gh*m, gw*m)
        rd = decim(ry)
        pad_c = jnp.pad(rd.astype(jnp.uint8), R, mode="edge")

        # coarse sweep: the fused Pallas kernel stages both decimated
        # planes in VMEM once and loops all (2R+1)^2 offsets in-register
        # (ops/pallas/me_sad.py, probe-gated); the fallback is the fully
        # static unrolled sweep — every offset a static slice the XLA
        # fuses into the abs-diff/block-reduce. (vmapped dynamic_slice
        # lowers to a gather at ~8 GB/s effective; lax.map adds per-step
        # overhead — both measured far slower.) Bit-identical either way.
        from homerhevc_tpu.ops.pallas.me_sad import (coarse_sweep_sads,
                                                     pallas_ok)
        n_off = side * side
        if pallas_ok() and m % 8 == 0 and (2 * R) % 8 == 0:
            sads = coarse_sweep_sads(sd16, pad_c.astype(jnp.int16), R, m)
        else:
            coarse_list = []
            for k in range(n_off):
                dy, dx = k // side - R, k % side - R
                sh = pad_c[R + dy:R + dy + gh * m, R + dx:R + dx + gw * m] \
                    .astype(jnp.int16)
                d = jnp.abs(sd16 - sh).astype(jnp.int32)
                coarse_list.append(d.reshape(gh, m, gw, m).sum(axis=(1, 3)))
            sads = jnp.stack(coarse_list)                   # coarse SADs
        ks = jnp.arange(n_off, dtype=jnp.int32)
        gh2, gw2 = self.gh2, self.gw2

        def prior_votes(sads_lvl, Glvl):
            gq = jnp.argmin(sads_lvl.sum(axis=(1, 2)))
            pr = jnp.stack([8 * (gq % side - R), 8 * (gq // side - R)]) \
                .astype(jnp.int32)
            rate = (mvd_bits[jnp.abs(8 * (ks % side - R) - pr[0])]
                    + mvd_bits[jnp.abs(8 * (ks // side - R) - pr[1])])
            cost = 4 * sads_lvl + ((lam16 * rate) >> 4)[:, None, None]
            cc = cost.reshape(n_off, -1)
            cols = jnp.arange(cc.shape[1])
            hist = jnp.zeros(n_off, jnp.int32)
            for _ in range(K):
                kb = jnp.argmin(cc, axis=0)
                hist = hist.at[kb].add(1)
                cc = cc.at[kb, cols].set(jnp.int32(1 << 30))
            shorts = []
            for _ in range(Glvl):
                kg = jnp.argmax(hist).astype(jnp.int32)
                shorts.append(kg)
                hist = hist.at[kg].set(-1)
            return pr, shorts
        prior, short16 = prior_votes(sads, G16)
        if self.tree:
            s4c = sads[:, :gh2 * 2, :].reshape(n_off, gh2, 2, gw2, 2) \
                .sum(axis=(2, 4))
            prior2, short32 = prior_votes(s4c, G32)
        else:
            prior2, short32 = None, []
        prior4, short64 = None, []
        if self.tree64 and self.gh4 > 0 and self.gw4 > 0:
            gh4, gw4 = self.gh4, self.gw4
            s8c = s4c[:, :gh4 * 2, :gw4 * 2].reshape(n_off, gh4, 2, gw4, 2) \
                .sum(axis=(2, 4))
            prior4, short64 = prior_votes(s8c, 2)       # golden G64 = 2

        # ---- FAR (4x-decimated) level: global candidates beyond the 2x
        # reach (golden twin: the far block of hier_pel_fields; reference
        # +-128x64 window, hmr_private.h:76-77) ----
        far_centers = []                      # traced (cdx, cdy) pairs
        if self.far:
            from homerhevc_tpu.golden.inter_frame import far_grid
            GQ = 4
            grid, vote_mask = far_grid(R, self.far)
            xq, yq = self.far // 4, min(self.far // 4, 16)
            sd4 = decim(sd16.astype(jnp.int32)).astype(jnp.int16)
            rd4 = decim(rd)
            m4 = 4
            gh4x, gw4x = sd4.shape[0] // m4, sd4.shape[1] // m4
            sd4 = sd4[:gh4x * m4, :gw4x * m4]
            pad_q = jnp.pad(rd4.astype(jnp.uint8), ((yq, yq), (xq, xq)),
                            mode="edge")
            sq_list = []
            for qx, qy in grid:
                shq = pad_q[yq + qy:yq + qy + gh4x * m4,
                            xq + qx:xq + qx + gw4x * m4].astype(jnp.int16)
                dq = jnp.abs(sd4 - shq).astype(jnp.int32)
                sq_list.append(dq.reshape(gh4x, m4, gw4x, m4)
                               .sum(axis=(1, 3)))
            sads_q = jnp.stack(sq_list)
            gxq = jnp.asarray([16 * q[0] for q in grid], jnp.int32)
            gyq = jnp.asarray([16 * q[1] for q in grid], jnp.int32)
            rate_q = (mvd_bits[jnp.abs(gxq - prior[0])]
                      + mvd_bits[jnp.abs(gyq - prior[1])])
            cost_q = 16 * sads_q + ((lam16 * rate_q) >> 4)[:, None, None]
            cq = cost_q.reshape(len(grid), -1)
            cq = jnp.where(jnp.asarray(vote_mask)[:, None], cq,
                           jnp.int32(1 << 30))
            colsq = jnp.arange(cq.shape[1])
            hist_q = jnp.zeros(len(grid), jnp.int32)
            for _ in range(K):
                kbq = jnp.argmin(cq, axis=0)
                hist_q = hist_q.at[kbq].add(1)
                cq = cq.at[kbq, colsq].set(jnp.int32(1 << 30))
            # 2x-level +-2 refine of each candidate by GLOBAL decimated SAD
            py2, px2 = 2 * yq + 2, 2 * xq + 2
            pad_c2 = jnp.pad(rd.astype(jnp.uint8), ((py2, py2), (px2, px2)),
                             mode="edge")
            h2c, w2c = sd16.shape
            qxs = jnp.asarray([q[0] for q in grid], jnp.int32)
            qys = jnp.asarray([q[1] for q in grid], jnp.int32)
            for _ in range(GQ):
                kq = jnp.argmax(hist_q).astype(jnp.int32)
                hist_q = hist_q.at[kq].set(-1)
                qx, qy = qxs[kq], qys[kq]
                gsum = []
                for oy in (-2, -1, 0, 1, 2):
                    band = jax.lax.dynamic_slice(
                        pad_c2, (py2 + 2 * qy + oy, px2 + 2 * qx - 2),
                        (h2c, w2c + 4)).astype(jnp.int16)
                    for ox in range(5):
                        gsum.append(jnp.sum(jnp.abs(
                            sd16 - band[:, ox:ox + w2c]).astype(jnp.int32)))
                gbest = jnp.argmin(jnp.stack(gsum)).astype(jnp.int32)
                far_centers.append((4 * qx + 2 * (gbest % 5 - 2),
                                    4 * qy + 2 * (gbest // 5 - 2)))

        # offset list: exact +-4 fine sweep, then shortlist neighbourhoods
        # (same order as golden hier_pel_fields: argmin first-min == the
        # golden sequential strict-< scan)
        F = 4
        fine_k = jnp.arange((2 * F + 1) ** 2, dtype=jnp.int32)
        all_dx = [fine_k % (2 * F + 1) - F]
        all_dy = [fine_k // (2 * F + 1) - F]
        go = jnp.arange(25, dtype=jnp.int32)
        grid_dx, grid_dy = go % 5 - 2, go // 5 - 2
        for kg in short16 + short32 + short64:
            all_dx.append(2 * (kg % side - R) + grid_dx)
            all_dy.append(2 * (kg // side - R) + grid_dy)
        for cdx, cdy in far_centers:
            all_dx.append(cdx + grid_dx)
            all_dy.append(cdy + grid_dy)
        all_dx = jnp.concatenate(all_dx)
        all_dy = jnp.concatenate(all_dy)
        n_offs_r = all_dx.shape[0]
        P = self.reach
        pad8F = jnp.pad(ry.astype(jnp.uint8), P, mode="edge")
        sy16 = sy.astype(jnp.int16)

        def bsum16(diff_band):
            return diff_band.reshape(gh, cu, gw, cu).sum(axis=(1, 3))
        sads_list = []
        # fine sweep: all-static slices (fused views at memory speed)
        for k in range((2 * F + 1) ** 2):
            dx, dy = k % (2 * F + 1) - F, k // (2 * F + 1) - F
            sh = pad8F[P + dy:P + dy + self.h, P + dx:P + dx + self.w] \
                .astype(jnp.int16)
            sads_list.append(bsum16(jnp.abs(sy16 - sh).astype(jnp.int32)))
        # shortlist neighbourhoods: one dynamic row-band per (entry, oy),
        # static column shifts within the band
        for kg in short16 + short32 + short64:
            cdx = 2 * (kg % side - R)
            cdy = 2 * (kg // side - R)
            for oy in (-2, -1, 0, 1, 2):
                band = jax.lax.dynamic_slice(
                    pad8F, (P + cdy + oy, P + cdx - 2),
                    (self.h, self.w + 4)).astype(jnp.int16)
                for ox in range(5):
                    d = jnp.abs(sy16 - band[:, ox:ox + self.w]) \
                        .astype(jnp.int32)
                    sads_list.append(bsum16(d))
        for cdx, cdy in far_centers:
            for oy in (-2, -1, 0, 1, 2):
                band = jax.lax.dynamic_slice(
                    pad8F, (P + cdy + oy, P + cdx - 2),
                    (self.h, self.w + 4)).astype(jnp.int16)
                for ox in range(5):
                    d = jnp.abs(sy16 - band[:, ox:ox + self.w]) \
                        .astype(jnp.int32)
                    sads_list.append(bsum16(d))
        sads_r = jnp.stack(sads_list)                       # (n_offs_r, ...)

        def level_best(sads_lvl, pr):
            rate = (mvd_bits[jnp.abs(4 * all_dx - pr[0])]
                    + mvd_bits[jnp.abs(4 * all_dy - pr[1])])
            cost = sads_lvl.reshape(n_offs_r, -1) \
                + ((lam16 * rate) >> 4)[:, None]
            bi = jnp.argmin(cost, axis=0)
            return jnp.stack([all_dx[bi], all_dy[bi]], axis=-1) * 4
        mvs = level_best(sads_r, prior)                     # (B, 2) qpel
        mv64 = None
        if self.tree:
            s32r = sads_r[:, :gh2 * 2, :].reshape(n_offs_r, gh2, 2, gw2, 2) \
                .sum(axis=(2, 4))
            mv32 = level_best(s32r, prior2)                 # (B2, 2) qpel
            if self.tree64 and self.gh4 > 0 and self.gw4 > 0:
                s64r = s32r[:, :self.gh4 * 2, :self.gw4 * 2] \
                    .reshape(n_offs_r, self.gh4, 2, self.gw4, 2) \
                    .sum(axis=(2, 4))
                mv64 = level_best(s64r, prior4)             # (B4, 2) qpel
        if not self.tree:
            mv32, prior2 = None, None
        return mvs, prior, mv32, prior2, mv64, prior4

    # ---- device program -----------------------------------------------------

    def _impl(self, src_y, src_u, src_v, ref_y, ref_u, ref_v, zf_mult, qp,
              qp_map=None):
        cu, cuc = self.cu, self.cu // 2
        gw, gh = self.gw, self.gh
        R = self.search
        sy = src_y.astype(jnp.int32)
        su = src_u.astype(jnp.int32)
        sv = src_v.astype(jnp.int32)
        ry = ref_y.astype(jnp.int32)

        qp = qp.astype(jnp.int32)
        qp_c = jnp.asarray(T.CHROMA_QP_MAP)[
            jnp.clip(qp + self.ps.cb_qp_offset, 0, 57)]
        # per-CTB AQ / row-RC map (QG = CTB): per-block QP vectors in the
        # quant tier; lambdas/zero-forcing stay slice-level (golden twin:
        # _encode_level16 cu_qps). Deblock + AQ stays on the host paths
        # (decoder-view QP inference); intra-in-P is disabled with maps.
        if qp_map is not None:
            qpm = qp_map.astype(jnp.int32)
            rep16 = self.ps.ctu_size // cu
            qp16 = jnp.repeat(jnp.repeat(qpm, rep16, 0), rep16, 1)[
                :gh, :gw].reshape(-1)
            qpc16 = jnp.asarray(T.CHROMA_QP_MAP)[
                jnp.clip(qp16 + self.ps.cb_qp_offset, 0, 57)]
            rep32 = self.ps.ctu_size // 32
            qp32v = jnp.repeat(jnp.repeat(qpm, rep32, 0), rep32, 1)[
                :self.gh2, :self.gw2].reshape(-1)
            qpc32 = jnp.asarray(T.CHROMA_QP_MAP)[
                jnp.clip(qp32v + self.ps.cb_qp_offset, 0, 57)]
            qp64v = qpm.reshape(-1)
            qpc64 = jnp.asarray(T.CHROMA_QP_MAP)[
                jnp.clip(qp64v + self.ps.cb_qp_offset, 0, 57)]
        else:
            qp16, qpc16 = qp, qp_c
            qp32v, qpc32 = qp, qp_c
            qp64v, qpc64 = qp, qp_c
        lam16 = jnp.asarray(T.LAMBDA_ME_X16_TAB)[qp]
        mvd_bits = jnp.asarray(T.MVD_BITS)
        mvs, prior, mv32, prior2, mv64, prior4 = self._hier_me(sy, ry,
                                                               lam16)

        # ---- sub-pel refinement (half then quarter) ----
        # One (n+8)^2 patch gather per block per frame; all 16 quarter-pel
        # phases are interpolated in-register over the patch, so the 17
        # refinement/MC evaluations become phase+crop selects instead of
        # gathers (refinement never leaves +-1 full pel of the ME result).
        from homerhevc_tpu.ops.interp import LUMA_TAPS, mc_chroma_batch
        from homerhevc_tpu.ops.interp import _windowed
        B = gh * gw
        padL = self.reach + 8     # hier ME roams up to `reach` full-pel
        ref_padL = jnp.pad(ry, padL, mode="edge")
        taps = jnp.asarray(LUMA_TAPS)
        x0s = (jnp.arange(B) % gw) * cu
        y0s = (jnp.arange(B) // gw) * cu
        src_blk = sy.reshape(gh, cu, gw, cu).transpose(0, 2, 1, 3) \
            .reshape(B, cu, cu)
        me_prec = int(self.cfg.motion_estimation_precision)

        def make_v16(x0v, y0v, mv0, n):
            """(16, B, n+1, n+1) quarter-pel interpolations of the patch
            anchored one pel up-left of the full-pel mv0."""
            ix0, iy0 = mv0[:, 0] >> 2, mv0[:, 1] >> 2
            by = y0v + iy0 - 1 + padL - 3
            bx = x0v + ix0 - 1 + padL - 3
            from homerhevc_tpu.ops.interp import extract_patches
            patch = extract_patches(ref_padL, by, bx, n + 8) \
                .astype(jnp.int32)                          # (B, n+8, n+8)
            wx = _windowed(patch, 8, axis=2)                # (B, n+8, n+1, 8)
            h4 = jnp.einsum("fk,byxk->fbyx", taps, wx)
            wy = _windowed(h4, 8, axis=2)                   # (4,B,n+1,n+1,8)
            v = jnp.einsum("gk,fbyxk->gfbyx", taps, wy) >> 6
            v16 = jnp.clip((v + 32) >> 6, 0, 255)
            return v16.reshape(16, -1, n + 1, n + 1), ix0, iy0

        def mc_v16(v16, ix0, iy0, mv, n):
            p = (mv[:, 1] & 3) * 4 + (mv[:, 0] & 3)
            oy = (mv[:, 1] >> 2) - (iy0 - 1)
            ox = (mv[:, 0] >> 2) - (ix0 - 1)
            sel = jnp.take_along_axis(
                v16, p[None, :, None, None], axis=0)[0]     # (B, n+1, n+1)
            c00 = sel[:, 0:n, 0:n]
            c01 = sel[:, 0:n, 1:n + 1]
            c10 = sel[:, 1:n + 1, 0:n]
            c11 = sel[:, 1:n + 1, 1:n + 1]
            idx = (oy * 2 + ox)[:, None, None]
            return jnp.where(idx == 0, c00,
                             jnp.where(idx == 1, c01,
                                       jnp.where(idx == 2, c10, c11)))

        def refine_with(v16, ix0, iy0, src_b, nb, mv_cur, step, pr):
            bc = jnp.full((mv_cur.shape[0],), 1 << 30, jnp.int32)
            bmv = mv_cur
            for dy in (-step, 0, step):
                for dx in (-step, 0, step):
                    cand = mv_cur + jnp.asarray([dx, dy], jnp.int32)
                    p = mc_v16(v16, ix0, iy0, cand, nb)
                    sad = jnp.sum(jnp.abs(src_b - p), axis=(-1, -2))
                    rt = (mvd_bits[jnp.abs(cand[:, 0] - pr[0])]
                          + mvd_bits[jnp.abs(cand[:, 1] - pr[1])])
                    cost = sad + ((lam16 * rt) >> 4)
                    better = cost < bc
                    bc = jnp.where(better, cost, bc)
                    bmv = jnp.where(better[:, None], cand, bmv)
            return bmv

        v16, ix0, iy0 = make_v16(x0s, y0s, mvs, cu)
        if me_prec >= 1:
            mvs = refine_with(v16, ix0, iy0, src_blk, cu, mvs, 2, prior)
        if me_prec >= 2:
            mvs = refine_with(v16, ix0, iy0, src_blk, cu, mvs, 1, prior)

        # ---- luma MC + residual ----
        pred = mc_v16(v16, ix0, iy0, mvs, cu)
        resid = src_blk - pred
        coef = forward_transform(resid, False)
        lvl = quantize(coef, cu, qp16, False, self.ps.scaling_list_enabled)
        if self.ps.sign_hiding:
            lvl = sign_bit_hiding(lvl, coef, cu, qp16, False, 0,
                                  self.ps.scaling_list_enabled)
        deq = dequantize(lvl, cu, qp16, False,
                         self.ps.scaling_list_enabled)
        rres = inverse_transform(deq, False)
        lvl, rres = self._zero_force(resid, lvl, rres, zf_mult)
        nz = jnp.any(lvl != 0, axis=(-1, -2))
        rec = jnp.where(nz[:, None, None],
                        jnp.clip(pred + rres, 0, 255), pred)

        lam = jnp.asarray(T.RD_LAMBDA_P_TAB)[qp]

        def cu_cost16(src_b, rec_b, lvl_b, mv_b):
            dd = (src_b - rec_b).astype(jnp.float32)
            ssd = jnp.sum(dd * dd, axis=(-1, -2))
            nnzf = jnp.sum((lvl_b != 0),
                           axis=(-1, -2)).astype(jnp.float32)
            lsum = jnp.sum(jnp.abs(lvl_b),
                           axis=(-1, -2)).astype(jnp.float32)
            rt = (mvd_bits[jnp.abs(mv_b[:, 0] - prior[0])]
                  + mvd_bits[jnp.abs(mv_b[:, 1] - prior[1])]) \
                .astype(jnp.float32)
            return ssd + lam * (3.0 * nnzf + lsum + 6.0 + rt)

        # ---- batched merge-RD (golden twin: merge_rd_fast): first two
        # spec merge candidates from the pre-pass field, re-coded and
        # model-costed; a king-independent improving subset flips ----
        if (not self.tree) and self.merge_rd and qp_map is None:
            from homerhevc_tpu.golden.inter_frame import \
                MERGE_FAST_BITS_BASE
            mvg = mvs.reshape(gh, gw, 2)
            pad_m = jnp.pad(mvg, ((1, 1), (1, 1), (0, 0)))
            gxs_g = jnp.arange(gw)[None, :]
            gys_g = jnp.arange(gh)[:, None]
            zb = jnp.zeros((gh, gw), bool)
            va1 = (gxs_g > 0) | zb
            vb1 = (gys_g > 0) | zb
            vb0 = ((gys_g > 0) & (gxs_g < gw - 1)) | zb
            vb2 = ((gys_g > 0) & (gxs_g > 0)) | zb
            a1 = pad_m[1:1 + gh, 0:gw]
            b1 = pad_m[0:gh, 1:1 + gw]
            b0 = pad_m[0:gh, 2:2 + gw]
            b2 = pad_m[0:gh, 0:gw]

            def neq(pm, qm, vq):
                return ~vq | jnp.any(pm != qm, axis=-1)
            k1 = va1
            k2 = vb1 & neq(b1, a1, va1)
            k3 = vb0 & neq(b0, b1, vb1)
            k4 = vb2 & neq(b2, a1, va1) & neq(b2, b1, vb1)
            kept = jnp.stack([k1, k2, k3, k4])
            mvs_k = jnp.stack([a1, b1, b0, b2])
            order = jnp.cumsum(kept, axis=0) * kept
            cand = []
            for c in range(2):
                sel_c = jnp.zeros((gh, gw, 2), jnp.int32)
                for sslot in range(4):
                    m = (order[sslot] == c + 1)[..., None]
                    sel_c = jnp.where(m, mvs_k[sslot], sel_c)
                cand.append(sel_c.reshape(-1, 2))
            # CU_AMVP_BITS == the 6.0 CU-overhead constant of cu_cost16
            cur_cost = cu_cost16(src_blk, rec, lvl, mvs)
            best_cost = jnp.full((B,), jnp.inf, jnp.float32)
            best_lvl, best_rec = lvl, rec
            best_mv = mvs
            for c in range(2):
                mvc = cand[c]
                vC, ixC, iyC = make_v16(x0s, y0s, mvc, cu)
                predc = mc_v16(vC, ixC, iyC, mvc, cu)
                residc = src_blk - predc
                coefc_ = forward_transform(residc, False)
                lvlc_ = quantize(coefc_, cu, qp, False,
                                 self.ps.scaling_list_enabled)
                if self.ps.sign_hiding:
                    lvlc_ = sign_bit_hiding(lvlc_, coefc_, cu, qp, False,
                                            0, self.ps.scaling_list_enabled)
                deqc_ = dequantize(lvlc_, cu, qp, False,
                                   self.ps.scaling_list_enabled)
                rrc_ = inverse_transform(deqc_, False)
                lvlc_, rrc_ = self._zero_force(residc, lvlc_, rrc_, zf_mult)
                nzc_ = jnp.any(lvlc_ != 0, axis=(-1, -2))
                recc_ = jnp.where(nzc_[:, None, None],
                                  jnp.clip(predc + rrc_, 0, 255), predc)
                dd = (src_blk - recc_).astype(jnp.float32)
                ssd = jnp.sum(dd * dd, axis=(-1, -2))
                nnzf = jnp.sum((lvlc_ != 0),
                               axis=(-1, -2)).astype(jnp.float32)
                lsum = jnp.sum(jnp.abs(lvlc_),
                               axis=(-1, -2)).astype(jnp.float32)
                cost = ssd + lam * (3.0 * nnzf + lsum
                                    + MERGE_FAST_BITS_BASE + c)
                same = jnp.all(mvc == mvs, axis=-1)
                if c == 1:
                    same = same | jnp.all(cand[1] == cand[0], axis=-1)
                cost = jnp.where(same, jnp.inf, cost)
                better = cost < best_cost
                best_cost = jnp.where(better, cost, best_cost)
                best_lvl = jnp.where(better[:, None, None], lvlc_,
                                     best_lvl)
                best_rec = jnp.where(better[:, None, None], recc_,
                                     best_rec)
                best_mv = jnp.where(better[:, None], mvc, best_mv)
            want = (best_cost < cur_cost).reshape(gh, gw)
            selm = select_intra_independent_j(want).reshape(-1)
            mvs = jnp.where(selm[:, None], best_mv, mvs)
            lvl = jnp.where(selm[:, None, None], best_lvl, lvl)
            rec = jnp.where(selm[:, None, None], best_rec, rec)
            nz = jnp.any(lvl != 0, axis=(-1, -2))

        # ---- chroma MC (batched per-CU fractional filters) + residual ----
        # (after merge-RD so flipped CUs' chroma codes at the final MV)
        padC = self.reach // 2 + 4    # full-pel chroma reach + filter taps
        cx0s, cy0s = x0s // 2, y0s // 2

        def chroma(src_c, ref_c):
            ref_padC = jnp.pad(ref_c.astype(jnp.int32), padC, mode="edge")
            predc = mc_chroma_batch(ref_padC, padC, cx0s, cy0s, cuc, mvs)
            src_cb = src_c.astype(jnp.int32).reshape(
                gh, cuc, gw, cuc).transpose(0, 2, 1, 3).reshape(B, cuc, cuc)
            resc = src_cb - predc
            coefc = forward_transform(resc, False)
            lvlc = quantize(coefc, cuc, qpc16, False,
                            self.ps.scaling_list_enabled)
            if self.ps.sign_hiding:
                lvlc = sign_bit_hiding(lvlc, coefc, cuc, qpc16, False, 0,
                                       self.ps.scaling_list_enabled)
            deqc = dequantize(lvlc, cuc, qpc16, False,
                              self.ps.scaling_list_enabled)
            rrc = inverse_transform(deqc, False)
            lvlc, rrc = self._zero_force(resc, lvlc, rrc, zf_mult)
            nzc = jnp.any(lvlc != 0, axis=(-1, -2))
            recc = jnp.where(nzc[:, None, None],
                             jnp.clip(predc + rrc, 0, 255), predc)
            return lvlc, recc

        lvl_u, rec_u = chroma(su, ref_u)
        lvl_v, rec_v = chroma(sv, ref_v)

        def unblock(blocks, n, hh, ww):
            gy, gx = hh // n, ww // n
            return blocks.reshape(gy, gx, n, n).transpose(0, 2, 1, 3) \
                .reshape(hh, ww)
        recon_y = unblock(rec, cu, self.h, self.w)
        recon_u = unblock(rec_u, cuc, self.h // 2, self.w // 2)
        recon_v = unblock(rec_v, cuc, self.h // 2, self.w // 2)
        ly = unblock(lvl.astype(jnp.int16), cu, self.h, self.w)
        lu = unblock(lvl_u.astype(jnp.int16), cuc, self.h // 2, self.w // 2)
        lv = unblock(lvl_v.astype(jnp.int16), cuc, self.h // 2, self.w // 2)
        mvs16 = mvs.reshape(gh, gw, 2).astype(jnp.int16)

        def rep2(a):
            return jnp.repeat(jnp.repeat(a, 2, 0), 2, 1)

        def deblock_inter(plane_y, nz8, mv8, ts8, intra8=None):
            """BS maps (spec 8.7.2.4) + device luma deblock. Either side
            intra -> BS=2 (intra-fallback CUs); else nz/mv mismatch -> 1.
            Chroma is untouched at BS<2 (8.7.2.5.5) — the BS2 chroma pass
            runs separately when intra CUs are present."""
            from homerhevc_tpu.ops.deblock import deblock_luma_bs
            h8, w8 = nz8.shape
            ux = jnp.arange(w8)[None, :]
            uy = jnp.arange(h8)[:, None]
            vv = (ux > 0) & (((ux * 8) % ts8) == 0)
            vh = (uy > 0) & (((uy * 8) % ts8) == 0)
            nzl = jnp.pad(nz8, ((0, 0), (1, 0)))[:, :-1]
            nzt = jnp.pad(nz8, ((1, 0), (0, 0)))[:-1, :]
            mvl = jnp.pad(mv8, ((0, 0), (1, 0), (0, 0)))[:, :-1]
            mvt = jnp.pad(mv8, ((1, 0), (0, 0), (0, 0)))[:-1, :]
            dl = jnp.any(jnp.abs(mv8 - mvl) >= 4, axis=-1)
            dt = jnp.any(jnp.abs(mv8 - mvt) >= 4, axis=-1)
            bs_v = (vv & (nz8 | nzl | dl)).astype(jnp.int32)
            bs_h = (vh & (nz8 | nzt | dt)).astype(jnp.int32)
            if intra8 is not None:
                il = jnp.pad(intra8, ((0, 0), (1, 0)))[:, :-1]
                it = jnp.pad(intra8, ((1, 0), (0, 0)))[:-1, :]
                bs_v = jnp.where(vv & (intra8 | il), 2, bs_v)
                bs_h = jnp.where(vh & (intra8 | it), 2, bs_h)
            return deblock_luma_bs(plane_y, bs_v, bs_h, qp)

        def deblock_chroma_intra(ru_, rv_, intra8):
            """BS2 chroma pass over intra-fallback CU edges (chroma-8 grid
            = even luma 8-units)."""
            from homerhevc_tpu.ops.deblock import deblock_chroma_bs
            h8, w8 = intra8.shape
            ux = jnp.arange(w8)[None, :]
            uy = jnp.arange(h8)[:, None]
            il = jnp.pad(intra8, ((0, 0), (1, 0)))[:, :-1]
            it = jnp.pad(intra8, ((1, 0), (0, 0)))[:-1, :]
            bs2_v = (ux > 0) & ((ux & 1) == 0) & (intra8 | il)
            bs2_h = (uy > 0) & ((uy & 1) == 0) & (intra8 | it)
            ru_ = deblock_chroma_bs(ru_, bs2_v, bs2_h, qp,
                                    self.ps.cb_qp_offset)
            rv_ = deblock_chroma_bs(rv_, bs2_v, bs2_h, qp,
                                    self.ps.cr_qp_offset)
            return ru_, rv_

        if not self.tree:
            extra = [mvs16]
            intra8 = None
            if self.cfg.intra_in_p and qp_map is None:
                c16 = cu_cost16(src_blk, rec, lvl, mvs).reshape(gh, gw)
                (recon_y, recon_u, recon_v, ly, lu, lv, intra16,
                 imode16) = self._intra_fallback(
                    sy, su, sv, recon_y, recon_u, recon_v, ly, lu, lv,
                    qp, qp_c, c16, lam, None)
                extra += [intra16.astype(jnp.uint8),
                          imode16.astype(jnp.uint8)]
                intra8 = rep2(intra16)
            if self.ps.deblocking_enabled:
                nz8 = rep2(nz.reshape(gh, gw))
                mv8 = jnp.repeat(jnp.repeat(mvs.reshape(gh, gw, 2), 2, 0),
                                 2, 1)
                ts8 = jnp.full(nz8.shape, 16, jnp.int32)
                recon_y = deblock_inter(recon_y, nz8, mv8, ts8, intra8)
                if intra8 is not None:
                    recon_u, recon_v = deblock_chroma_intra(
                        recon_u, recon_v, intra8)
            if self.ps.sao_enabled:
                recon_y, recon_u, recon_v, sao_p = self._sao(
                    sy, su, sv, recon_y, recon_u, recon_v, qp)
                extra.append(sao_p)
            return self._wire(recon_y, recon_u, recon_v, sy,
                              extra, ly, lu, lv)

        # ---- CU32 layer: code each full CTB32 as one CU32, keep whichever
        # side wins SSD + lambda*rate (golden encode_inter_frame_tree twin) --
        # mv32/prior2 come from the shared 16/32 shortlist refine above.
        gh2, gw2 = self.gh2, self.gw2
        B2 = gh2 * gw2
        x0s2 = (jnp.arange(B2) % gw2) * 32
        y0s2 = (jnp.arange(B2) // gw2) * 32
        src32 = sy[:gh2 * 32].reshape(gh2, 32, gw2, 32) \
            .transpose(0, 2, 1, 3).reshape(B2, 32, 32)

        v16b, ix0b, iy0b = make_v16(x0s2, y0s2, mv32, 32)
        if me_prec >= 1:
            mv32 = refine_with(v16b, ix0b, iy0b, src32, 32, mv32, 2, prior2)
        if me_prec >= 2:
            mv32 = refine_with(v16b, ix0b, iy0b, src32, 32, mv32, 1, prior2)
        pred32 = mc_v16(v16b, ix0b, iy0b, mv32, 32)
        resid32 = src32 - pred32
        coef32 = forward_transform(resid32, False)
        lvl32 = quantize(coef32, 32, qp32v, False,
                         self.ps.scaling_list_enabled)
        if self.ps.sign_hiding:
            lvl32 = sign_bit_hiding(lvl32, coef32, 32, qp32v, False, 0,
                                    self.ps.scaling_list_enabled)
        deq32 = dequantize(lvl32, 32, qp32v, False,
                           self.ps.scaling_list_enabled)
        rres32 = inverse_transform(deq32, False)
        lvl32, rres32 = self._zero_force(resid32, lvl32, rres32, zf_mult)
        nz32 = jnp.any(lvl32 != 0, axis=(-1, -2))
        rec32 = jnp.where(nz32[:, None, None],
                          jnp.clip(pred32 + rres32, 0, 255), pred32)

        def cu_cost(src_b, rec_b, lvl_b, mv_b):
            d = (src_b - rec_b).astype(jnp.float32)
            ssd = jnp.sum(d * d, axis=(-1, -2))
            nnzf = jnp.sum((lvl_b != 0), axis=(-1, -2)).astype(jnp.float32)
            lsum = jnp.sum(jnp.abs(lvl_b), axis=(-1, -2)).astype(jnp.float32)
            rt = (mvd_bits[jnp.abs(mv_b[:, 0] - prior2[0])]
                  + mvd_bits[jnp.abs(mv_b[:, 1] - prior2[1])]) \
                .astype(jnp.float32)
            return ssd + lam * (3.0 * nnzf + lsum + 6.0 + rt)

        c32 = cu_cost(src32, rec32, lvl32, mv32).reshape(gh2, gw2)
        c16 = cu_cost(src_blk, rec, lvl, mvs).reshape(gh, gw)
        c16p = c16[:gh2 * 2].reshape(gh2, 2, gw2, 2).sum(axis=(1, 3))
        choose = c32 <= c16p                                # (gh2, gw2)
        if self.perf >= 1:
            # fast-skip consolidation (golden mv_spread16 twin,
            # inter_frame.py): a merged CU whose adopted sub-CU motion
            # disagrees by > 16 qpel never wins — masked here since the
            # batched program has already evaluated every level
            g = mvs.reshape(gh, gw, 2)[:gh2 * 2] \
                .reshape(gh2, 2, gw2, 2, 2)
            spread = (g.max(axis=(1, 3)) - g.min(axis=(1, 3))) \
                .max(axis=-1)
            choose = choose & (spread <= 16)

        # chroma for CU32 (TU16 chroma at the 32 grid)
        def chroma32(src_c, ref_c):
            ref_padC = jnp.pad(ref_c.astype(jnp.int32), padC, mode="edge")
            predc = mc_chroma_batch(ref_padC, padC, x0s2 // 2, y0s2 // 2,
                                    16, mv32)
            src_cb = src_c.astype(jnp.int32)[:gh2 * 16] \
                .reshape(gh2, 16, gw2, 16).transpose(0, 2, 1, 3) \
                .reshape(B2, 16, 16)
            resc = src_cb - predc
            coefc = forward_transform(resc, False)
            lvlc = quantize(coefc, 16, qpc32, False,
                            self.ps.scaling_list_enabled)
            if self.ps.sign_hiding:
                lvlc = sign_bit_hiding(lvlc, coefc, 16, qpc32, False, 0,
                                       self.ps.scaling_list_enabled)
            deqc = dequantize(lvlc, 16, qpc32, False,
                              self.ps.scaling_list_enabled)
            rrc = inverse_transform(deqc, False)
            lvlc, rrc = self._zero_force(resc, lvlc, rrc, zf_mult)
            nzc = jnp.any(lvlc != 0, axis=(-1, -2))
            recc = jnp.where(nzc[:, None, None],
                             jnp.clip(predc + rrc, 0, 255), predc)
            return lvlc, recc

        lvl_u32, rec_u32 = chroma32(su, ref_u)
        lvl_v32, rec_v32 = chroma32(sv, ref_v)

        def combine(plane16, blocks32, m, dt):
            """Overwrite the top gh2*m rows of plane16 with blocks32 where
            the CTB was chosen at depth 0."""
            p32 = blocks32.astype(dt).reshape(gh2, gw2, m, m) \
                .transpose(0, 2, 1, 3).reshape(gh2 * m, gw2 * m)
            mask = jnp.repeat(jnp.repeat(choose, m, 0), m, 1)
            top = jnp.where(mask, p32, plane16[:gh2 * m])
            return jnp.concatenate([top, plane16[gh2 * m:]], axis=0)

        recon_y = combine(recon_y, rec32, 32, recon_y.dtype)
        ly = combine(ly, lvl32.astype(jnp.int16), 32, jnp.int16)
        recon_u = combine(recon_u, rec_u32, 16, recon_u.dtype)
        recon_v = combine(recon_v, rec_v32, 16, recon_v.dtype)
        lu = combine(lu, lvl_u32.astype(jnp.int16), 16, jnp.int16)
        lv = combine(lv, lvl_v32.astype(jnp.int16), 16, jnp.int16)
        extra = [mvs16, choose.astype(jnp.uint8),
                 mv32.reshape(gh2, gw2, 2).astype(jnp.int16)]

        # ---- CU64 layer (CTB64): one CU64 per CTB, luma as four forced-
        # split TU32s (golden twin: encode_inter_frame_tree want64,
        # reference CU64 default homer_app.c:307-337) ----
        choose64 = nzq8 = None
        if self.tree64:
            gh4, gw4 = self.gh4, self.gw4
            B4 = gh4 * gw4
            x0s4 = (jnp.arange(B4) % gw4) * 64
            y0s4 = (jnp.arange(B4) // gw4) * 64
            src64 = sy.reshape(gh4, 64, gw4, 64).transpose(0, 2, 1, 3) \
                .reshape(B4, 64, 64)
            v16d, ix0d, iy0d = make_v16(x0s4, y0s4, mv64, 64)
            if me_prec >= 1:
                mv64 = refine_with(v16d, ix0d, iy0d, src64, 64, mv64, 2,
                                   prior2)
            if me_prec >= 2:
                mv64 = refine_with(v16d, ix0d, iy0d, src64, 64, mv64, 1,
                                   prior2)
            pred64 = mc_v16(v16d, ix0d, iy0d, mv64, 64)
            resid64 = src64 - pred64
            r4 = resid64.reshape(B4, 2, 32, 2, 32) \
                .transpose(0, 1, 3, 2, 4).reshape(B4 * 4, 32, 32)
            coef64 = forward_transform(r4, False)
            qp64q = (qp64v if qp_map is None
                     else jnp.repeat(qp64v, 4))
            lvl64q = quantize(coef64, 32, qp64q, False,
                              self.ps.scaling_list_enabled)
            if self.ps.sign_hiding:
                lvl64q = sign_bit_hiding(lvl64q, coef64, 32, qp64q, False,
                                         0, self.ps.scaling_list_enabled)
            deq64 = dequantize(lvl64q, 32, qp64q, False,
                               self.ps.scaling_list_enabled)
            rr64q = inverse_transform(deq64, False)
            lvl64q, rr64q = self._zero_force(r4, lvl64q, rr64q, zf_mult)
            nz64q = jnp.any(lvl64q != 0, axis=(-1, -2))    # (B4*4,)

            def q2full(blocks, m):
                return blocks.reshape(B4, 2, 2, m, m) \
                    .transpose(0, 1, 3, 2, 4).reshape(B4, 2 * m, 2 * m)
            lvl64 = q2full(lvl64q, 32)
            rres64 = q2full(rr64q, 32)
            rec64 = jnp.clip(pred64 + rres64, 0, 255)

            def cu_cost64(src_b, rec_b, lvl_b, mv_b):
                d = (src_b - rec_b).astype(jnp.float32)
                ssd = jnp.sum(d * d, axis=(-1, -2))
                nnzf = jnp.sum((lvl_b != 0),
                               axis=(-1, -2)).astype(jnp.float32)
                lsum = jnp.sum(jnp.abs(lvl_b),
                               axis=(-1, -2)).astype(jnp.float32)
                rt = (mvd_bits[jnp.abs(mv_b[:, 0] - prior2[0])]
                      + mvd_bits[jnp.abs(mv_b[:, 1] - prior2[1])]) \
                    .astype(jnp.float32)
                return ssd + lam * (3.0 * nnzf + lsum + 6.0 + rt)
            c64 = cu_cost64(src64, rec64, lvl64, mv64).reshape(gh4, gw4)
            # adopted-region cost after the CU32 pass
            r32 = jnp.where(choose, c32, c16p)
            r64 = r32[:gh4 * 2, :gw4 * 2].reshape(gh4, 2, gw4, 2) \
                .sum(axis=(1, 3))
            choose64 = c64 <= r64
            if self.perf >= 1:
                # fast-skip over the POST-CU32-adoption motion field
                # (golden reads desc.mv after the CU32 pass)
                ch16m = jnp.repeat(jnp.repeat(choose, 2, 0), 2, 1)
                mv32r = jnp.repeat(jnp.repeat(
                    mv32.reshape(gh2, gw2, 2), 2, 0), 2, 1)
                mv16p = jnp.where(ch16m[:, :, None], mv32r,
                                  mvs.reshape(gh, gw, 2)[:gh2 * 2])
                g4 = mv16p[:gh4 * 4, :gw4 * 4] \
                    .reshape(gh4, 4, gw4, 4, 2)
                spread64 = (g4.max(axis=(1, 3)) - g4.min(axis=(1, 3))) \
                    .max(axis=-1)
                choose64 = choose64 & (spread64 <= 16)

            def combine64(plane, blocks, m, dt):
                p64 = blocks.astype(dt).reshape(gh4, gw4, m, m) \
                    .transpose(0, 2, 1, 3).reshape(gh4 * m, gw4 * m)
                mask = jnp.repeat(jnp.repeat(choose64, m, 0), m, 1)
                return jnp.where(mask, p64, plane)

            recon_y = combine64(recon_y, rec64, 64, recon_y.dtype)
            ly = combine64(ly, lvl64.astype(jnp.int16), 64, jnp.int16)

            # chroma: four 16x16 TUs over the 32x32 chroma block
            def chroma64(src_c, ref_c):
                ref_padC = jnp.pad(ref_c.astype(jnp.int32), padC,
                                   mode="edge")
                predc = mc_chroma_batch(ref_padC, padC, x0s4 // 2,
                                        y0s4 // 2, 32, mv64)
                src_cb = src_c.astype(jnp.int32) \
                    .reshape(gh4, 32, gw4, 32).transpose(0, 2, 1, 3) \
                    .reshape(B4, 32, 32)
                resc = src_cb - predc
                rc4 = resc.reshape(B4, 2, 16, 2, 16) \
                    .transpose(0, 1, 3, 2, 4).reshape(B4 * 4, 16, 16)
                coefc = forward_transform(rc4, False)
                qpc64q = (qpc64 if qp_map is None
                          else jnp.repeat(qpc64, 4))
                lvlc = quantize(coefc, 16, qpc64q, False,
                                self.ps.scaling_list_enabled)
                if self.ps.sign_hiding:
                    lvlc = sign_bit_hiding(lvlc, coefc, 16, qpc64q, False,
                                           0, self.ps.scaling_list_enabled)
                deqc = dequantize(lvlc, 16, qpc64q, False,
                                  self.ps.scaling_list_enabled)
                rrc = inverse_transform(deqc, False)
                lvlc, rrc = self._zero_force(rc4, lvlc, rrc, zf_mult)
                lvl_f = q2full(lvlc, 16)
                rr_f = q2full(rrc, 16)
                recc = jnp.clip(predc + rr_f, 0, 255)
                return lvl_f, recc
            lvc_u, recc_u = chroma64(su, ref_u)
            lvc_v, recc_v = chroma64(sv, ref_v)
            recon_u = combine64(recon_u, recc_u, 32, recon_u.dtype)
            recon_v = combine64(recon_v, recc_v, 32, recon_v.dtype)
            lu = combine64(lu, lvc_u.astype(jnp.int16), 32, jnp.int16)
            lv = combine64(lv, lvc_v.astype(jnp.int16), 32, jnp.int16)
            # per-TU32 nonzero map at the 8-grid (deblock nz rule)
            nzq8 = jnp.repeat(jnp.repeat(
                nz64q.reshape(gh4, gw4, 2, 2).transpose(0, 2, 1, 3)
                .reshape(gh4 * 2, gw4 * 2), 4, 0), 4, 1)
            extra += [choose64.astype(jnp.uint8),
                      mv64.reshape(gh4, gw4, 2).astype(jnp.int16)]
        intra8 = None
        if self.cfg.intra_in_p and qp_map is None:
            # CU16 cells covered by an adopted CU32/CU64 are excluded
            # (golden twin skips consolidated nodes)
            ch16 = jnp.repeat(jnp.repeat(choose, 2, 0), 2, 1)
            if choose64 is not None:
                ch16 = ch16 | jnp.repeat(jnp.repeat(choose64, 4, 0), 4, 1)[
                    :ch16.shape[0], :ch16.shape[1]]
            excl16 = jnp.pad(ch16, ((0, gh - ch16.shape[0]), (0, 0)))
            (recon_y, recon_u, recon_v, ly, lu, lv, intra16,
             imode16) = self._intra_fallback(
                sy, su, sv, recon_y, recon_u, recon_v, ly, lu, lv,
                qp, qp_c, c16, lam, excl16)
            extra += [intra16.astype(jnp.uint8), imode16.astype(jnp.uint8)]
            intra8 = rep2(intra16)
        if self.ps.deblocking_enabled:
            ch4 = jnp.repeat(jnp.repeat(choose, 4, 0), 4, 1)
            pad_rows = self.h // 8 - ch4.shape[0]
            chf = jnp.pad(ch4, ((0, pad_rows), (0, 0)))
            nz8 = rep2(nz.reshape(gh, gw))
            nz32_8 = jnp.pad(jnp.repeat(jnp.repeat(
                nz32.reshape(gh2, gw2), 4, 0), 4, 1),
                ((0, pad_rows), (0, 0)))
            nz8 = jnp.where(chf, nz32_8, nz8)
            mv8 = jnp.repeat(jnp.repeat(mvs.reshape(gh, gw, 2), 2, 0), 2, 1)
            mv32_8 = jnp.pad(jnp.repeat(jnp.repeat(
                mv32.reshape(gh2, gw2, 2), 4, 0), 4, 1),
                ((0, pad_rows), (0, 0), (0, 0)))
            mv8 = jnp.where(chf[..., None], mv32_8, mv8)
            ts8 = jnp.where(chf, 32, 16).astype(jnp.int32)
            if choose64 is not None:
                ch8_64 = jnp.repeat(jnp.repeat(choose64, 8, 0), 8, 1)
                nz8 = jnp.where(ch8_64, nzq8, nz8)
                mv64_8 = jnp.repeat(jnp.repeat(
                    mv64.reshape(self.gh4, self.gw4, 2), 8, 0), 8, 1)
                mv8 = jnp.where(ch8_64[..., None], mv64_8, mv8)
                # CU64 luma TUs are the four forced-split TU32s
                ts8 = jnp.where(ch8_64, 32, ts8)
            recon_y = deblock_inter(recon_y, nz8, mv8, ts8, intra8)
            if intra8 is not None:
                recon_u, recon_v = deblock_chroma_intra(
                    recon_u, recon_v, intra8)
        if self.ps.sao_enabled:
            recon_y, recon_u, recon_v, sao_p = self._sao(
                sy, su, sv, recon_y, recon_u, recon_v, qp)
            extra.append(sao_p)
        return self._wire(recon_y, recon_u, recon_v, sy, extra, ly, lu, lv)

    def _impl_b(self, src_y, src_u, src_v, r0y, r0u, r0v, r1y, r1u, r1v,
                zf_mult, qp):
        """Bi-capable frame (B in IBP, or generalized-B "P") with PER-CU
        uni/bi selection: every CU codes whichever of {uni-L0, uni-L1, bi}
        wins SSD + lambda*rate (reference analog: per-CU inter direction
        choice in hmr_cu_motion_estimation, hmr_motion_inter.c:2471-2880;
        bi ME :1279). Bi uses the normative 14-bit weighted average.
        Golden twin: encode_b_frame_tree (bit-exact; the uni-L1 candidate
        searches the SOURCE while the bi list-1 field matches the bi
        target 2*src - pred0). CU32/CU16 tree."""
        assert self.tree
        cu, cuc = self.cu, self.cu // 2
        gw, gh = self.gw, self.gh
        gh2, gw2 = self.gh2, self.gw2
        R = self.search
        sy = src_y.astype(jnp.int32)
        su = src_u.astype(jnp.int32)
        sv = src_v.astype(jnp.int32)
        ry0 = r0y.astype(jnp.int32)
        ry1 = r1y.astype(jnp.int32)
        qp = qp.astype(jnp.int32)
        qp_c = jnp.asarray(T.CHROMA_QP_MAP)[
            jnp.clip(qp + self.ps.cb_qp_offset, 0, 57)]
        lam16 = jnp.asarray(T.LAMBDA_ME_X16_TAB)[qp]
        lam = jnp.asarray(T.RD_LAMBDA_P_TAB)[qp]
        mvd_bits = jnp.asarray(T.MVD_BITS)
        me_prec = int(self.cfg.motion_estimation_precision)
        from homerhevc_tpu.ops.interp import (LUMA_TAPS, _windowed,
                                              mc_chroma_batch,
                                              mc_chroma_batch_14)
        taps = jnp.asarray(LUMA_TAPS)
        B = gh * gw
        B2 = gh2 * gw2
        padL = self.reach + 8
        padC = self.reach // 2 + 4

        mvs0, pr0, mv32_0, pr2_0, _, _ = self._hier_me(sy, ry0, lam16)
        # uni-L1 candidate motion field: matched to the SOURCE
        mvs1s, pr1s, mv32_1s, pr2_1s, _, _ = self._hier_me(sy, ry1, lam16)

        x0s = (jnp.arange(B) % gw) * cu
        y0s = (jnp.arange(B) // gw) * cu
        x0s2 = (jnp.arange(B2) % gw2) * 32
        y0s2 = (jnp.arange(B2) // gw2) * 32
        src_blk = sy.reshape(gh, cu, gw, cu).transpose(0, 2, 1, 3) \
            .reshape(B, cu, cu)
        src32 = sy[:gh2 * 32].reshape(gh2, 32, gw2, 32) \
            .transpose(0, 2, 1, 3).reshape(B2, 32, 32)

        def subpel_tools(ry):
            ref_padL = jnp.pad(ry, padL, mode="edge")

            def make_v(x0v, y0v, mv0, n):
                """(v16, v14, ix0, iy0): rounded and 14-bit quarter-pel
                interpolations of the (n+8)^2 patch."""
                ix0, iy0 = mv0[:, 0] >> 2, mv0[:, 1] >> 2
                by = y0v + iy0 - 1 + padL - 3
                bx = x0v + ix0 - 1 + padL - 3
                from homerhevc_tpu.ops.interp import extract_patches
                patch = extract_patches(ref_padL, by, bx, n + 8) \
                    .astype(jnp.int32)
                wx = _windowed(patch, 8, axis=2)
                h4 = jnp.einsum("fk,byxk->fbyx", taps, wx)
                wy = _windowed(h4, 8, axis=2)
                v = jnp.einsum("gk,fbyxk->gfbyx", taps, wy) >> 6
                v16 = jnp.clip((v + 32) >> 6, 0, 255)
                return (v16.reshape(16, -1, n + 1, n + 1),
                        v.reshape(16, -1, n + 1, n + 1), ix0, iy0)
            return make_v

        def sel_phase(vstack, ix0, iy0, mv, n):
            p = (mv[:, 1] & 3) * 4 + (mv[:, 0] & 3)
            oy = (mv[:, 1] >> 2) - (iy0 - 1)
            ox = (mv[:, 0] >> 2) - (ix0 - 1)
            sel = jnp.take_along_axis(
                vstack, p[None, :, None, None], axis=0)[0]
            c00 = sel[:, 0:n, 0:n]
            c01 = sel[:, 0:n, 1:n + 1]
            c10 = sel[:, 1:n + 1, 0:n]
            c11 = sel[:, 1:n + 1, 1:n + 1]
            idx = (oy * 2 + ox)[:, None, None]
            return jnp.where(idx == 0, c00,
                             jnp.where(idx == 1, c01,
                                       jnp.where(idx == 2, c10, c11)))

        def refine_v(v16, ix0, iy0, src_b, nb, mv_cur, step, pr,
                     bounds=None):
            bc = jnp.full((mv_cur.shape[0],), 1 << 30, jnp.int32)
            bmv = mv_cur
            for dy in (-step, 0, step):
                for dx in (-step, 0, step):
                    cand = mv_cur + jnp.asarray([dx, dy], jnp.int32)
                    if bounds is not None:
                        # keep candidates inside the interpolation volume:
                        # it covers only two integer positions per axis
                        # ([4*ix0-4, 4*ix0+3] qpel); a volume centred at a
                        # non-zero-phase MV could otherwise drift past it
                        # and sel_phase would read the wrong pixels
                        cand = jnp.clip(cand, bounds[0], bounds[1])
                    p = sel_phase(v16, ix0, iy0, cand, nb)
                    sad = jnp.sum(jnp.abs(src_b - p), axis=(-1, -2))
                    rt = (mvd_bits[jnp.abs(cand[:, 0] - pr[0])]
                          + mvd_bits[jnp.abs(cand[:, 1] - pr[1])])
                    cost = sad + ((lam16 * rt) >> 4)
                    better = cost < bc
                    bc = jnp.where(better, cost, bc)
                    bmv = jnp.where(better[:, None], cand, bmv)
            return bmv

        mkv0 = subpel_tools(ry0)
        mkv1 = subpel_tools(ry1)

        def refine_and_pred(mk, mvq, pr, src_b, x0v, y0v, n):
            """Subpel-refine mvq and return (mvq, 14-bit pred, rounded
            uni pred) at the refined position."""
            v16, v14, ix0, iy0 = mk(x0v, y0v, mvq, n)
            if me_prec >= 1:
                mvq = refine_v(v16, ix0, iy0, src_b, n, mvq, 2, pr)
            if me_prec >= 2:
                mvq = refine_v(v16, ix0, iy0, src_b, n, mvq, 1, pr)
            p14 = sel_phase(v14, ix0, iy0, mvq, n)
            pu8 = sel_phase(v16, ix0, iy0, mvq, n)
            return mvq, p14, pu8

        def code_pred(pred, src_b, n, qp_, qp_zf):
            """TU coding of one prediction; returns (lvl, rec, nz)."""
            resid = src_b - pred
            coef = forward_transform(resid, False)
            lvl = quantize(coef, n, qp_, False, self.ps.scaling_list_enabled)
            if self.ps.sign_hiding:
                lvl = sign_bit_hiding(lvl, coef, n, qp_, False, 0,
                                      self.ps.scaling_list_enabled)
            deq = dequantize(lvl, n, qp_, False,
                             self.ps.scaling_list_enabled)
            rres = inverse_transform(deq, False)
            lvl, rres = self._zero_force(resid, lvl, rres, qp_zf)
            nz = jnp.any(lvl != 0, axis=(-1, -2))
            rec = jnp.where(nz[:, None, None],
                            jnp.clip(pred + rres, 0, 255), pred)
            return lvl, rec, nz

        def code_bi(p14a, p14b, src_b, n, qp_, qp_zf):
            pred = jnp.clip((p14a + p14b + 64) >> 7, 0, 255)
            return code_pred(pred, src_b, n, qp_, qp_zf)

        def cu_cost(src_b, rec_b, lvl_b, rt):
            d = (src_b - rec_b).astype(jnp.float32)
            ssd = jnp.sum(d * d, axis=(-1, -2))
            nnzf = jnp.sum((lvl_b != 0), axis=(-1, -2)).astype(jnp.float32)
            lsum = jnp.sum(jnp.abs(lvl_b), axis=(-1, -2)).astype(jnp.float32)
            return ssd + lam * (3.0 * nnzf + lsum + 6.0
                                + rt.astype(jnp.float32))

        def rate_of(mv, pr):
            return (mvd_bits[jnp.abs(mv[:, 0] - pr[0])]
                    + mvd_bits[jnp.abs(mv[:, 1] - pr[1])])

        def choose3(cbi, cu0, cu1):
            """dir bitmask per block: bi wins ties against both unis,
            uni-L0 against uni-L1 (golden choose() twin)."""
            bi_best = (cbi <= cu0) & (cbi <= cu1)
            return jnp.where(bi_best, 3,
                             jnp.where(cu0 <= cu1, 1, 2)).astype(jnp.int32)

        def sel3(dirv, a_bi, a_u0, a_u1):
            shape = (slice(None),) + (None,) * (a_bi.ndim - 1)
            d = dirv[shape]
            return jnp.where(d == 3, a_bi, jnp.where(d == 1, a_u0, a_u1))

        # ---- CU16 level: list 0 first, then bi list-1 by BI-TARGET
        # matching (2*src - pred0; reference analog
        # hmr_bi_motion_estimation_HM, hmr_motion_inter.c:1279) ----
        mvs0, p14_0, pu8_0 = refine_and_pred(mkv0, mvs0, pr0, src_blk,
                                             x0s, y0s, cu)
        tgt_plane = 2 * sy - pu8_0.reshape(gh, gw, cu, cu) \
            .transpose(0, 2, 1, 3).reshape(self.h, self.w)
        mvs1, pr1, mv32_1, pr2_1, _, _ = self._hier_me(tgt_plane, ry1,
                                                       lam16)
        tgt_blk = tgt_plane.reshape(gh, cu, gw, cu).transpose(0, 2, 1, 3) \
            .reshape(B, cu, cu)
        mvs1, p14_1, pu8_1 = refine_and_pred(mkv1, mvs1, pr1, tgt_blk,
                                             x0s, y0s, cu)
        mvs1s, _, pu8_1s = refine_and_pred(mkv1, mvs1s, pr1s, src_blk,
                                           x0s, y0s, cu)
        lvl_bi, rec_bi, nz_bi = code_bi(p14_0, p14_1, src_blk, cu, qp,
                                        zf_mult)
        cbi = cu_cost(src_blk, rec_bi, lvl_bi,
                      rate_of(mvs0, pr0) + rate_of(mvs1, pr1))

        def refine_bi0(mk, mv0c, pr_, pu8b, p14b, mv1c, pr1_, src_b,
                       x0v, y0v, n, lvl_b, rec_b, nz_b, cb):
            """Alternating bi refinement: re-refine list 0 against the
            complement target 2*src - pred1, keep the refined bi coding
            where it wins RD (golden twin: refine_l0_against; reference
            hmr_bi_motion_estimation_HM, hmr_motion_inter.c:954,:1279)."""
            tgt0 = 2 * src_b - pu8b
            v16r, v14r, ixr, iyr = mk(x0v, y0v, mv0c, n)
            bounds = (jnp.stack([4 * ixr - 4, 4 * iyr - 4], axis=1),
                      jnp.stack([4 * ixr + 3, 4 * iyr + 3], axis=1))
            mv0r = mv0c
            if me_prec >= 1:
                mv0r = refine_v(v16r, ixr, iyr, tgt0, n, mv0r, 2, pr_,
                                bounds)
            if me_prec >= 2:
                mv0r = refine_v(v16r, ixr, iyr, tgt0, n, mv0r, 1, pr_,
                                bounds)
            p14r = sel_phase(v14r, ixr, iyr, mv0r, n)
            lvl_r, rec_r, nz_r = code_bi(p14r, p14b, src_b, n, qp, zf_mult)
            cbr = cu_cost(src_b, rec_r, lvl_r,
                          rate_of(mv0r, pr_) + rate_of(mv1c, pr1_))
            use = cbr < cb
            return (jnp.where(use[:, None], mv0r, mv0c),
                    jnp.where(use[:, None, None], lvl_r, lvl_b),
                    jnp.where(use[:, None, None], rec_r, rec_b),
                    jnp.where(use, nz_r, nz_b),
                    jnp.minimum(cb, cbr))

        mv0bi, lvl_bi, rec_bi, nz_bi, cbi = refine_bi0(
            mkv0, mvs0, pr0, pu8_1, p14_1, mvs1, pr1, src_blk,
            x0s, y0s, cu, lvl_bi, rec_bi, nz_bi, cbi)
        lvl_u0, rec_u0, nz_u0 = code_pred(pu8_0, src_blk, cu, qp, zf_mult)
        lvl_u1, rec_u1, nz_u1 = code_pred(pu8_1s, src_blk, cu, qp, zf_mult)
        cu0 = cu_cost(src_blk, rec_u0, lvl_u0, rate_of(mvs0, pr0))
        cu1 = cu_cost(src_blk, rec_u1, lvl_u1, rate_of(mvs1s, pr1s))
        dir16 = choose3(cbi, cu0, cu1)
        c16best = jnp.minimum(cbi, jnp.minimum(cu0, cu1))
        lvl = sel3(dir16, lvl_bi, lvl_u0, lvl_u1)
        rec = sel3(dir16, rec_bi, rec_u0, rec_u1)
        nz = sel3(dir16, nz_bi, nz_u0, nz_u1)
        # effective per-list motion (zero when the list is unused; the bi
        # list-0 MV may differ from the uni-L0 one after refine_bi0)
        mv0_eff = jnp.where((dir16 == 3)[:, None], mv0bi,
                            jnp.where((dir16 == 1)[:, None], mvs0, 0))
        mv1_sel = jnp.where((dir16 == 3)[:, None], mvs1, mvs1s)
        mv1_eff = jnp.where((dir16 & 2)[:, None].astype(bool), mv1_sel, 0)

        # ---- chroma: select the chosen direction's prediction, code once
        # (the uni/bi choice is luma-driven, exactly as golden) ----
        cx0s, cy0s = x0s // 2, y0s // 2
        r0up = jnp.pad(r0u.astype(jnp.int32), padC, mode="edge")
        r0vp = jnp.pad(r0v.astype(jnp.int32), padC, mode="edge")
        r1up = jnp.pad(r1u.astype(jnp.int32), padC, mode="edge")
        r1vp = jnp.pad(r1v.astype(jnp.int32), padC, mode="edge")

        def blk_c(src_c, n, rows):
            p = src_c if rows is None else src_c[:rows]
            hh, ww = p.shape
            return p.reshape(hh // n, n, ww // n, n) \
                .transpose(0, 2, 1, 3).reshape(-1, n, n)

        def chroma_sel(src_cb, rpa, rpb, x0v, y0v, n, dirv,
                       mva, mva_bi, mvb_bi, mvb_uni):
            ca14 = mc_chroma_batch_14(rpa, padC, x0v, y0v, n, mva_bi)
            cb14 = mc_chroma_batch_14(rpb, padC, x0v, y0v, n, mvb_bi)
            pred_bi = jnp.clip((ca14 + cb14 + 64) >> 7, 0, 255)
            pred_u0 = mc_chroma_batch(rpa, padC, x0v, y0v, n, mva)
            pred_u1 = mc_chroma_batch(rpb, padC, x0v, y0v, n, mvb_uni)
            pred = sel3(dirv, pred_bi, pred_u0, pred_u1)
            return code_pred(pred, src_cb, n, qp_c, zf_mult)[:2]

        lvl_u, rec_u = chroma_sel(blk_c(su, cuc, None), r0up, r1up,
                                  cx0s, cy0s, cuc, dir16,
                                  mvs0, mv0bi, mvs1, mvs1s)
        lvl_v, rec_v = chroma_sel(blk_c(sv, cuc, None), r0vp, r1vp,
                                  cx0s, cy0s, cuc, dir16,
                                  mvs0, mv0bi, mvs1, mvs1s)

        def unblock(blocks, n, hh, ww):
            gy, gx = hh // n, ww // n
            return blocks.reshape(gy, gx, n, n).transpose(0, 2, 1, 3) \
                .reshape(hh, ww)
        recon_y = unblock(rec, cu, self.h, self.w)
        recon_u = unblock(rec_u, cuc, self.h // 2, self.w // 2)
        recon_v = unblock(rec_v, cuc, self.h // 2, self.w // 2)
        ly = unblock(lvl.astype(jnp.int16), cu, self.h, self.w)
        lu = unblock(lvl_u.astype(jnp.int16), cuc, self.h // 2, self.w // 2)
        lv = unblock(lvl_v.astype(jnp.int16), cuc, self.h // 2, self.w // 2)

        # ---- CU32 level (same three-way selection) ----
        mv32_0, p32a, pu8_32a = refine_and_pred(mkv0, mv32_0, pr2_0, src32,
                                                x0s2, y0s2, 32)
        tgt32 = 2 * src32 - pu8_32a
        mv32_1, p32b, pu8_32t = refine_and_pred(mkv1, mv32_1, pr2_1, tgt32,
                                                x0s2, y0s2, 32)
        mv32_1s, _, pu8_32b = refine_and_pred(mkv1, mv32_1s, pr2_1s, src32,
                                              x0s2, y0s2, 32)
        lvl32_bi, rec32_bi, nz32_bi = code_bi(p32a, p32b, src32, 32, qp,
                                              zf_mult)
        c32bi = cu_cost(src32, rec32_bi, lvl32_bi,
                        rate_of(mv32_0, pr2_0) + rate_of(mv32_1, pr2_1))
        mv32_0bi, lvl32_bi, rec32_bi, nz32_bi, c32bi = refine_bi0(
            mkv0, mv32_0, pr2_0, pu8_32t, p32b, mv32_1, pr2_1, src32,
            x0s2, y0s2, 32, lvl32_bi, rec32_bi, nz32_bi, c32bi)
        lvl32_u0, rec32_u0, nz32_u0 = code_pred(pu8_32a, src32, 32, qp,
                                                zf_mult)
        lvl32_u1, rec32_u1, nz32_u1 = code_pred(pu8_32b, src32, 32, qp,
                                                zf_mult)
        c32u0 = cu_cost(src32, rec32_u0, lvl32_u0, rate_of(mv32_0, pr2_0))
        c32u1 = cu_cost(src32, rec32_u1, lvl32_u1,
                        rate_of(mv32_1s, pr2_1s))
        dir32 = choose3(c32bi, c32u0, c32u1)
        c32 = jnp.minimum(c32bi, jnp.minimum(c32u0, c32u1)).reshape(gh2, gw2)
        lvl32 = sel3(dir32, lvl32_bi, lvl32_u0, lvl32_u1)
        rec32 = sel3(dir32, rec32_bi, rec32_u0, rec32_u1)
        nz32 = sel3(dir32, nz32_bi, nz32_u0, nz32_u1)
        mv32_0e = jnp.where((dir32 == 3)[:, None], mv32_0bi,
                            jnp.where((dir32 == 1)[:, None], mv32_0, 0))
        mv32_1sel = jnp.where((dir32 == 3)[:, None], mv32_1, mv32_1s)
        mv32_1e = jnp.where((dir32 & 2)[:, None].astype(bool), mv32_1sel, 0)

        c16p = c16best.reshape(gh, gw)[:gh2 * 2] \
            .reshape(gh2, 2, gw2, 2).sum(axis=(1, 3))
        choose = c32 <= c16p

        lvl_u32, rec_u32 = chroma_sel(blk_c(su, 16, gh2 * 16), r0up, r1up,
                                      x0s2 // 2, y0s2 // 2, 16, dir32,
                                      mv32_0, mv32_0bi, mv32_1, mv32_1s)
        lvl_v32, rec_v32 = chroma_sel(blk_c(sv, 16, gh2 * 16), r0vp, r1vp,
                                      x0s2 // 2, y0s2 // 2, 16, dir32,
                                      mv32_0, mv32_0bi, mv32_1, mv32_1s)

        def combine(plane16, blocks32, m, dt):
            p32 = blocks32.astype(dt).reshape(gh2, gw2, m, m) \
                .transpose(0, 2, 1, 3).reshape(gh2 * m, gw2 * m)
            mask = jnp.repeat(jnp.repeat(choose, m, 0), m, 1)
            top = jnp.where(mask, p32, plane16[:gh2 * m])
            return jnp.concatenate([top, plane16[gh2 * m:]], axis=0)

        recon_y = combine(recon_y, rec32, 32, recon_y.dtype)
        ly = combine(ly, lvl32.astype(jnp.int16), 32, jnp.int16)
        recon_u = combine(recon_u, rec_u32, 16, recon_u.dtype)
        recon_v = combine(recon_v, rec_v32, 16, recon_v.dtype)
        lu = combine(lu, lvl_u32.astype(jnp.int16), 16, jnp.int16)
        lv = combine(lv, lvl_v32.astype(jnp.int16), 16, jnp.int16)

        if self.ps.deblocking_enabled:
            from homerhevc_tpu.ops.deblock import deblock_luma_bs
            ch4 = jnp.repeat(jnp.repeat(choose, 4, 0), 4, 1)
            pad_rows = self.h // 8 - ch4.shape[0]
            chf = jnp.pad(ch4, ((0, pad_rows), (0, 0)))
            rep2 = lambda a: jnp.repeat(jnp.repeat(a, 2, 0), 2, 1)
            nz8 = rep2(nz.reshape(gh, gw))
            nz32_8 = jnp.pad(jnp.repeat(jnp.repeat(
                nz32.reshape(gh2, gw2), 4, 0), 4, 1),
                ((0, pad_rows), (0, 0)))
            nz8 = jnp.where(chf, nz32_8, nz8)

            def map8(a16, a32, comps):
                a = jnp.repeat(jnp.repeat(
                    a16.reshape(gh, gw, *comps), 2, 0), 2, 1)
                b = jnp.pad(jnp.repeat(jnp.repeat(
                    a32.reshape(gh2, gw2, *comps), 4, 0), 4, 1),
                    ((0, pad_rows), (0, 0)) + ((0, 0),) * len(comps))
                m = chf[(...,) + (None,) * len(comps)] if comps else chf
                return jnp.where(m, b, a)
            mv8a = map8(mv0_eff, mv32_0e, (2,))
            mv8b = map8(mv1_eff, mv32_1e, (2,))
            dir8 = map8(dir16, dir32, ())
            ts8 = jnp.where(chf, 32, 16).astype(jnp.int32)
            ux = jnp.arange(nz8.shape[1])[None, :]
            uy = jnp.arange(nz8.shape[0])[:, None]
            vv = (ux > 0) & (((ux * 8) % ts8) == 0)
            vh = (uy > 0) & (((uy * 8) % ts8) == 0)

            def diffs(mv8, use):
                mvl = jnp.pad(mv8, ((0, 0), (1, 0), (0, 0)))[:, :-1]
                mvt = jnp.pad(mv8, ((1, 0), (0, 0), (0, 0)))[:-1, :]
                dl = jnp.any(jnp.abs(mv8 - mvl) >= 4, axis=-1)
                dt = jnp.any(jnp.abs(mv8 - mvt) >= 4, axis=-1)
                return dl & use, dt & use
            # spec 8.7.2.4: direction mismatch between neighbours -> BS=1;
            # same direction -> per-list mv comparison (golden bs_between)
            dirl = jnp.pad(dir8, ((0, 0), (1, 0)))[:, :-1]
            dirt = jnp.pad(dir8, ((1, 0), (0, 0)))[:-1, :]
            dml = dir8 != dirl
            dmt = dir8 != dirt
            dla, dta = diffs(mv8a, (dir8 & 1).astype(bool))
            dlb, dtb = diffs(mv8b, (dir8 & 2).astype(bool))
            nzl = jnp.pad(nz8, ((0, 0), (1, 0)))[:, :-1]
            nzt = jnp.pad(nz8, ((1, 0), (0, 0)))[:-1, :]
            bs_v = (vv & (nz8 | nzl | dml | dla | dlb)).astype(jnp.int32)
            bs_h = (vh & (nz8 | nzt | dmt | dta | dtb)).astype(jnp.int32)
            recon_y = deblock_luma_bs(recon_y, bs_v, bs_h, qp)

        extra = [mv0_eff.reshape(gh, gw, 2).astype(jnp.int16),
                 mv1_eff.reshape(gh, gw, 2).astype(jnp.int16),
                 dir16.reshape(gh, gw).astype(jnp.uint8),
                 choose.astype(jnp.uint8),
                 mv32_0e.reshape(gh2, gw2, 2).astype(jnp.int16),
                 mv32_1e.reshape(gh2, gw2, 2).astype(jnp.int16),
                 dir32.reshape(gh2, gw2).astype(jnp.uint8)]
        if self.ps.sao_enabled:
            recon_y, recon_u, recon_v, sao_p = self._sao(
                sy, su, sv, recon_y, recon_u, recon_v, qp)
            extra.append(sao_p)
        return self._wire(recon_y, recon_u, recon_v, sy, extra, ly, lu, lv)

    def _intra_fallback(self, sy, su, sv, ry, ru, rv, ly, lu, lv,
                        qp, qp_c, cost_p, lam, excl16):
        """Device twin of golden intra_fallback_p: INTRA_P_ROUNDS batched
        rounds of {35-mode search from the current recon ADI -> TU16 RD ->
        king-graph independent-set commit}. Bit-exact to the golden loop
        (tests/test_tpu_inter.py). Returns updated planes/levels + the
        committed (gh, gw) intra mask and mode map."""
        from homerhevc_tpu.golden.inter_frame import (
            INTRA_P_MODE_BITS_MPM, INTRA_P_MODE_BITS_REM, INTRA_P_ROUNDS)
        from homerhevc_tpu.ops import intra as dip
        gh, gw = self.h // 16, self.w // 16
        B = gh * gw
        sl = self.ps.scaling_list_enabled
        bits_tab = np.asarray([T.intra_mode_bits(q) for q in range(52)],
                              np.int32)
        bits_mpm = jnp.asarray(bits_tab[:, 0])[qp]
        bits_rem = jnp.asarray(bits_tab[:, 1])[qp]
        # independence => every intra CU's neighbors are inter, so the
        # decoder-side MPM list is the constant mpm_candidates(DC, DC)
        in_mpm = np.isin(np.arange(35), (0, 1, 26))
        mode_sad_bits = jnp.where(jnp.asarray(in_mpm), bits_mpm, bits_rem)
        mb_f = jnp.where(jnp.asarray(in_mpm),
                         jnp.float32(INTRA_P_MODE_BITS_MPM),
                         jnp.float32(INTRA_P_MODE_BITS_REM))
        mask65 = jnp.asarray(self.if_mask).reshape(B, 65)
        mask33 = jnp.asarray(self.if_mask_c).reshape(B, 33)

        def blockify(p, n):
            hh, ww = p.shape
            return p.reshape(hh // n, n, ww // n, n).transpose(0, 2, 1, 3) \
                .reshape(-1, n, n)

        def unblockify(b, n, hh, ww):
            return b.reshape(hh // n, ww // n, n, n).transpose(0, 2, 1, 3) \
                .reshape(hh, ww)

        src16 = blockify(sy, 16)
        srcu = blockify(su, 8)
        srcv = blockify(sv, 8)
        is_intra = jnp.zeros((gh, gw), bool)
        mode16 = jnp.zeros((gh, gw), jnp.int32)
        for _ in range(INTRA_P_ROUNDS):
            # directional block: X may not be an ADI source of a committed
            # intra CU (committed at X's {E, SE, S, SW, NE} blocks X)
            p = jnp.pad(is_intra, 1)
            blocked = (p[1:-1, 2:] | p[2:, 2:] | p[2:, 1:-1]
                       | p[2:, :-2] | p[:-2, 2:])
            seq = dip.gather_ref_seq(ry, 16).reshape(B, 65)
            seq = dip.substitute_refs(seq, mask65)
            top, left = dip.seq_to_refs(seq, 16)
            preds = dip.predict_all_modes(top, left, 16, True)
            preds = dip.edge_fixes(preds, top, left, 16, True)
            sad = jnp.sum(jnp.abs(src16[:, None] - preds),
                          axis=(-1, -2)).astype(jnp.int32)
            mode = jnp.argmin(sad + mode_sad_bits[None, :],
                              axis=-1).astype(jnp.int32)
            pred = jnp.take_along_axis(
                preds, mode[:, None, None, None], axis=1)[:, 0]
            resid = src16 - pred
            coef = forward_transform(resid, False)
            lvl = quantize(coef, 16, qp, True, sl)
            if self.ps.sign_hiding:
                lvl = sign_bit_hiding(lvl, coef, 16, qp, True, 0, sl)
            deq = dequantize(lvl, 16, qp, True, sl)
            rres = inverse_transform(deq, False)
            nz = jnp.any(lvl != 0, axis=(-1, -2))
            rec = jnp.where(nz[:, None, None],
                            jnp.clip(pred + rres, 0, 255), pred)
            d = (src16 - rec).astype(jnp.float32)
            ssd = jnp.sum(d * d, axis=(-1, -2))
            nnzf = jnp.sum(lvl != 0, axis=(-1, -2)).astype(jnp.float32)
            lsum = jnp.sum(jnp.abs(lvl), axis=(-1, -2)).astype(jnp.float32)
            cost_i = ssd + lam * (3.0 * nnzf + lsum + 6.0 + mb_f[mode])
            want = (cost_i.reshape(gh, gw) < cost_p) & ~is_intra & ~blocked
            if excl16 is not None:
                want = want & ~excl16
            sel = select_intra_independent_j(want)
            is_intra = is_intra | sel
            mode16 = jnp.where(sel, mode.reshape(gh, gw), mode16)
            selrep = jnp.repeat(jnp.repeat(sel, 16, 0), 16, 1)
            ry = jnp.where(selrep, unblockify(rec, 16, self.h, self.w), ry)
            ly = jnp.where(selrep,
                           unblockify(lvl.astype(jnp.int16), 16, self.h,
                                      self.w), ly)
            selrep_c = jnp.repeat(jnp.repeat(sel, 8, 0), 8, 1)
            outc = []
            for plane, srcc, lev in ((ru, srcu, lu), (rv, srcv, lv)):
                cseq = dip.gather_ref_seq(plane, 8).reshape(B, 33)
                cseq = dip.substitute_refs(cseq, mask33)
                ctop, cleft = dip.seq_to_refs(cseq, 8)
                cpred = dip.predict_mode(ctop, cleft, 8, mode, False)
                cres = srcc - cpred
                ccoef = forward_transform(cres, False)
                clvl = quantize(ccoef, 8, qp_c, True, sl)
                if self.ps.sign_hiding:
                    clvl = sign_bit_hiding(clvl, ccoef, 8, qp_c, True, 0,
                                           sl)
                cdeq = dequantize(clvl, 8, qp_c, True, sl)
                crr = inverse_transform(cdeq, False)
                cnz = jnp.any(clvl != 0, axis=(-1, -2))
                crec = jnp.where(cnz[:, None, None],
                                 jnp.clip(cpred + crr, 0, 255), cpred)
                hh, ww = self.h // 2, self.w // 2
                plane = jnp.where(selrep_c, unblockify(crec, 8, hh, ww),
                                  plane)
                lev = jnp.where(selrep_c,
                                unblockify(clvl.astype(jnp.int16), 8, hh,
                                           ww), lev)
                outc.append((plane, lev))
            (ru, lu), (rv, lv) = outc
        return ry, ru, rv, ly, lu, lv, is_intra, mode16

    def _sao(self, sy, su, sv, recon_y, recon_u, recon_v, qp):
        """Device SAO decide+apply (ops/sao_dev.py); returns filtered
        planes + packed params for the wire meta. qp traced."""
        from homerhevc_tpu.ops.sao_dev import pack_params, sao_analyze_apply
        lam_x256 = (jnp.asarray(T.RD_LAMBDA_I_TAB)[qp] * 256.0 + 0.5) \
            .astype(jnp.int32)
        ry_f, ru_f, rv_f, params = sao_analyze_apply(
            sy, su, sv, recon_y.astype(jnp.int32), recon_u.astype(jnp.int32),
            recon_v.astype(jnp.int32), self.ps.ctu_size, lam_x256)
        return ry_f, ru_f, rv_f, pack_params(params)

    def _wire(self, recon_y, recon_u, recon_v, sy, extra, ly, lu, lv):
        """Assemble the device->host wire tuple: recon planes stay device
        resident; levels go as the two-tier CG wire (per-4x4-group
        presence bits + compacted 16-bit masks + 2-bit level codes +
        escape list, ops/pack.py pack_sparse_cg); the motion metadata +
        per-row luma SSD (exact int32, feeds the avg_dist zero-forcing
        feedback without pulling recon to host) ride in the same uint8
        buffer fetched in a single link round trip."""
        from homerhevc_tpu.ops.pack import pack_sparse_cg
        recon_y = recon_y.astype(jnp.uint8)
        recon_u = recon_u.astype(jnp.uint8)
        recon_v = recon_v.astype(jnp.uint8)
        d = recon_y.astype(jnp.int32) - sy
        row_ssd = jnp.sum(d * d, axis=1).astype(jnp.int32)   # exact per row
        cg_bitmap, masks16, codes, esc_idx, esc_val, count, esc_count, \
            cg_count = pack_sparse_cg([ly, lu, lv], self.pack_C, self.cg_C)

        def u8(a):
            if a.dtype == jnp.uint8:
                return a.reshape(-1)
            return jax.lax.bitcast_convert_type(a, jnp.uint8).reshape(-1)
        meta = jnp.concatenate(
            [u8(x) for x in extra]
            + [u8(row_ssd), cg_bitmap, u8(masks16), codes,
               u8(esc_idx), u8(esc_val),
               u8(count.reshape(1)), u8(esc_count.reshape(1)),
               u8(cg_count.reshape(1))])
        return (recon_y, recon_u, recon_v, ly, lu, lv, meta)

    def _zero_force(self, resid, lvl, rres, zf_mult):
        """Reference-parity residual zero-forcing (hmr_motion_inter.c:106):
        per TU, drop the coded block when
        ssd_zero <= ssd_coded + clip(avg_dist/2.5 - 5, 1, 20000) * sum|lvl|.
        zf_mult is the clipped multiplier, tracked per frame by the pipeline
        from the previous frame's average 4x4 distortion (adaptive: as
        distortion rises the encoder stops chasing reference-frame quant
        noise). Identical arithmetic to golden.inter_frame.zero_force."""
        r64 = resid.astype(jnp.float32)
        ssd_zero = jnp.sum(r64 * r64, axis=(-1, -2))
        dcoded = (resid - rres).astype(jnp.float32)
        ssd_coded = jnp.sum(dcoded * dcoded, axis=(-1, -2))
        lsum = jnp.sum(jnp.abs(lvl), axis=(-1, -2)).astype(jnp.float32)
        drop = ssd_zero <= ssd_coded + zf_mult * lsum
        lvl = jnp.where(drop[:, None, None], 0, lvl)
        rres = jnp.where(drop[:, None, None], 0, rres)
        return lvl, rres

    # ---- host driver ----------------------------------------------------------

    def dispatch(self, src, ref, avg_dist: float = 1000.0, qp=None,
                 qp_map=None):
        """Launch the device program; returns the device output tuple
        without forcing any transfer. self.last_dev immediately holds the
        (device-resident) post-deblock recon for chaining the next frame.
        qp: per-frame QP (defaults to cfg.qp); a device input, so QP
        changes never recompile."""
        from homerhevc_tpu.golden.inter_frame import zf_multiplier
        y, u, v = src
        ry, ru, rv = ref
        qp = self.cfg.qp if qp is None else int(qp)
        zf_mult = zf_multiplier(avg_dist, qp)
        if qp_map is not None:
            assert not self.ps.deblocking_enabled, \
                "device AQ needs deblocking off (decoder-view QP on host)"
            assert not self.cfg.intra_in_p, \
                "device AQ excludes intra-in-P (golden twin parity)"

        def as_dev(a):
            # device arrays (the chained reference recon) pass through
            # without a host round-trip
            if isinstance(a, jax.Array):
                return a
            return jnp.asarray(np.asarray(a, np.uint8))

        qpm_dev = (None if qp_map is None
                   else jnp.asarray(np.asarray(qp_map, np.int32)))
        out = self._jit(as_dev(y), as_dev(u), as_dev(v),
                        as_dev(ry), as_dev(ru), as_dev(rv),
                        jnp.float32(zf_mult), jnp.int32(qp),
                        qp_map=qpm_dev)
        # post-deblock recon stays resident for the next frame in the chain
        self.last_dev = (out[0], out[1], out[2])
        # start the metadata + values-head downloads now; they complete
        # while the host serializes the previous frame
        try:
            out[6].copy_to_host_async()
        except Exception:
            pass
        return out

    def fetch(self, out, is_b: bool = False, bi: bool = False,
              ref_dists=(1, 2), qp_map=None):
        """Download one dispatched frame's compact wire data and build the
        FrameDesc (host half of encode_frame). Reconstruction planes are
        returned device-resident (lazily materialized by consumers).
        bi: the output came from _impl_b (two-list motion + per-CU
        direction maps in the meta); ref_dists feed the AMVP scaling of
        the mixed-direction syntax selection."""
        from homerhevc_tpu.ops.pack import esc_capacity
        recon_y, recon_u, recon_v, ly, lu, lv, meta = out
        meta_np = np.asarray(meta)
        gh, gw = self.gh, self.gw
        gh2, gw2 = self.gh2, self.gw2
        off = 0

        def take(nbytes, dt=None, shape=None):
            nonlocal off
            a = meta_np[off:off + nbytes]
            off += nbytes
            if dt is not None:
                a = a.copy().view(dt)
            return a.reshape(shape) if shape is not None else a
        mvs = take(gh * gw * 4, np.int16, (gh, gw, 2))
        mvs1 = mv32_1 = dir16 = dir32 = None
        if bi:
            mvs1 = take(gh * gw * 4, np.int16, (gh, gw, 2))
            dir16 = take(gh * gw, None, (gh, gw))
        if self.tree:
            choose = take(gh2 * gw2, None, (gh2, gw2))
            mv32 = take(gh2 * gw2 * 4, np.int16, (gh2, gw2, 2))
            if bi:
                mv32_1 = take(gh2 * gw2 * 4, np.int16, (gh2, gw2, 2))
                dir32 = take(gh2 * gw2, None, (gh2, gw2))
        choose64 = mv64 = None
        if self.tree64 and not bi:
            gh4, gw4 = self.gh4, self.gw4
            choose64 = take(gh4 * gw4, None, (gh4, gw4))
            mv64 = take(gh4 * gw4 * 4, np.int16, (gh4, gw4, 2))
        intra16 = imode16 = None
        if self.cfg.intra_in_p and not bi:
            gih, giw = self.h // 16, self.w // 16
            intra16 = take(gih * giw, None, (gih, giw)).astype(bool)
            imode16 = take(gih * giw, None, (gih, giw))
        sao_params = None
        if self.ps.sao_enabled:
            from homerhevc_tpu.ops.sao_dev import (params_nbytes,
                                                   unpack_params)
            sgh = self.h // self.ps.ctu_size
            sgw = self.w // self.ps.ctu_size
            sao_params = unpack_params(take(params_nbytes(sgh, sgw)),
                                       sgh, sgw)
        row_ssd = take(self.h * 4, np.int32)
        n_tot = self.w * self.h * 3 // 2
        E = esc_capacity(n_tot, self.pack_C)
        from homerhevc_tpu.engine.intra_encoder import (_parse_cg_wire,
                                                        _unpack_cg_frame)
        wire = _parse_cg_wire(meta_np[None, off:], 0, n_tot, self.pack_C,
                              self.cg_C, E)
        shapes = [(self.h, self.w), (self.h // 2, self.w // 2),
                  (self.h // 2, self.w // 2)]
        py, pu, pv = _unpack_cg_frame(
            wire, 0, n_tot, shapes,
            lambda: (np.asarray(ly), np.asarray(lu), np.asarray(lv)))
        cu = self.cu
        desc = FrameDesc.alloc(self.w, self.h)
        desc.pred_mode[:] = MODE_INTER
        desc.cu_depth[:] = self.ps.log2_ctu - (cu.bit_length() - 1)
        r8 = cu // 8
        desc.mv[:] = np.repeat(np.repeat(mvs.astype(np.int32), r8, 0), r8, 1)
        if bi:
            desc.mv_l1 = np.repeat(np.repeat(mvs1.astype(np.int32),
                                             r8, 0), r8, 1)
            desc.mvp_flag_l1 = np.zeros_like(desc.mvp_flag)
            desc.inter_dir = np.repeat(np.repeat(dir16.astype(np.uint8),
                                                 r8, 0), r8, 1)
        desc.coef_y = np.ascontiguousarray(py, np.int16)
        desc.coef_u = np.ascontiguousarray(pu, np.int16)
        desc.coef_v = np.ascontiguousarray(pv, np.int16)
        desc.row_ssd_y = row_ssd     # exact luma SSD per row vs source
        desc.sao_params = sao_params  # device-decided (recon pre-filtered)
        if qp_map is not None:
            r = self.ps.ctu_size // 8
            desc.qp_map = np.repeat(np.repeat(
                np.asarray(qp_map), r, 0), r, 1)[
                :self.h // 8, :self.w // 8].astype(np.int8)
        if intra16 is not None and intra16.any():
            from homerhevc_tpu.hevc.syntax import MODE_INTRA
            m8 = np.repeat(np.repeat(intra16, 2, 0), 2, 1)
            desc.pred_mode[m8] = MODE_INTRA
            desc.tr_depth[m8] = 0
            desc.skip[m8] = 0
            desc.mv[m8] = 0
            m4 = np.repeat(np.repeat(intra16, 4, 0), 4, 1)
            lm4 = np.repeat(np.repeat(imode16, 4, 0), 4, 1)
            desc.luma_mode[m4] = lm4[m4]
            cm8 = np.repeat(np.repeat(imode16, 2, 0), 2, 1)
            desc.chroma_mode[m8] = cm8[m8]
        if self.tree:
            ch = np.repeat(np.repeat(choose.astype(bool), 4, 0), 4, 1)
            m32 = np.repeat(np.repeat(mv32.astype(np.int32), 4, 0), 4, 1)
            full = np.zeros(desc.cu_depth.shape, bool)
            full[:ch.shape[0], :ch.shape[1]] = ch
            desc.cu_depth[full] = self.ps.log2_ctu - 5    # CU32 depth
            desc.mv[:ch.shape[0], :ch.shape[1]][ch] = m32[ch]
            if choose64 is not None:
                c64 = np.repeat(np.repeat(choose64.astype(bool), 8, 0),
                                8, 1)
                m64 = np.repeat(np.repeat(mv64.astype(np.int32), 8, 0),
                                8, 1)
                desc.cu_depth[c64] = 0
                desc.tr_depth[c64] = 1        # forced TU32 split
                desc.mv[c64] = m64[c64]
            if bi:
                m32b = np.repeat(np.repeat(mv32_1.astype(np.int32),
                                           4, 0), 4, 1)
                desc.mv_l1[:ch.shape[0], :ch.shape[1]][ch] = m32b[ch]
                d32r = np.repeat(np.repeat(dir32.astype(np.uint8),
                                           4, 0), 4, 1)
                desc.inter_dir[:ch.shape[0], :ch.shape[1]][ch] = d32r[ch]
            from homerhevc_tpu.golden.inter_frame import \
                select_inter_syntax_tree
            select_inter_syntax_tree(self.ps, desc, is_b=is_b or bi,
                                     dists=ref_dists)
        else:
            select_inter_syntax(self.ps, desc, cu, is_b=is_b)
        return desc, recon_y, recon_u, recon_v

    def dispatch_b(self, src, ref0, ref1, avg_dist: float = 1000.0,
                   qp=None):
        """Launch the bi-predicted device program (_impl_b)."""
        from homerhevc_tpu.golden.inter_frame import zf_multiplier
        if not hasattr(self, "_jit_b"):
            self._jit_b = jax.jit(self._impl_b)
        qp = self.cfg.qp if qp is None else int(qp)
        zf_mult = zf_multiplier(avg_dist, qp)

        def as_dev(a):
            if isinstance(a, jax.Array):
                return a
            return jnp.asarray(np.asarray(a, np.uint8))
        y, u, v = src
        out = self._jit_b(as_dev(y), as_dev(u), as_dev(v),
                          as_dev(ref0[0]), as_dev(ref0[1]), as_dev(ref0[2]),
                          as_dev(ref1[0]), as_dev(ref1[1]), as_dev(ref1[2]),
                          jnp.float32(zf_mult), jnp.int32(qp))
        self.last_dev = (out[0], out[1], out[2])
        try:
            out[6].copy_to_host_async()
        except Exception:
            pass
        return out

    def encode_frame_b(self, src, ref0, ref1, avg_dist: float = 1000.0,
                       qp=None, ref_dists=(1, -1)):
        return self.fetch(self.dispatch_b(src, ref0, ref1, avg_dist, qp=qp),
                          bi=True, ref_dists=ref_dists)

    def encode_frame(self, src, ref, is_b: bool = False,
                     avg_dist: float = 1000.0, qp=None, qp_map=None):
        return self.fetch(self.dispatch(src, ref, avg_dist, qp=qp,
                                        qp_map=qp_map),
                          is_b=is_b, qp_map=qp_map)
