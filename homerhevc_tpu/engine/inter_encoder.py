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


class TpuInterEncoder:
    def __init__(self, ps: ParamSets, cfg: EncoderConfig, cu: int = 16,
                 search: int = 16):
        self.ps = ps
        self.cfg = cfg
        self.cu = cu
        self.search = search
        self.w, self.h = cfg.width, cfg.height
        assert self.w % cu == 0 and self.h % cu == 0
        self.gw, self.gh = self.w // cu, self.h // cu
        self.qp = cfg.qp
        self.qp_c = T.chroma_qp(cfg.qp + ps.cb_qp_offset)
        self.lam = float(T.rd_lambda(cfg.qp, "P"))
        self._jit = jax.jit(self._impl)

    # ---- device program -----------------------------------------------------

    def _impl(self, src_y, src_u, src_v, ref_y, ref_u, ref_v, zf_mult):
        cu, cuc = self.cu, self.cu // 2
        gw, gh = self.gw, self.gh
        R = self.search
        sy = src_y.astype(jnp.int32)
        su = src_u.astype(jnp.int32)
        sv = src_v.astype(jnp.int32)
        ry = ref_y.astype(jnp.int32)

        # ---- ME: SAD maps via shifted-plane block sums, lambda-rate cost ----
        # Mirrors golden.inter_frame.full_pel_field: pass 1 = global-motion
        # prior (argmin whole-frame SAD), pass 2 = per-block
        # argmin SAD + (lam16 * mvd_bits(mv - prior)) >> 4.
        pad = jnp.pad(ry, R, mode="edge")
        side = 2 * R + 1
        lam16 = jnp.int32(T.lambda_me_x16(self.qp))
        mvd_bits = jnp.asarray(T.MVD_BITS)

        def sad_k(k):
            dy = k // side - R
            dx = k % side - R
            shifted = jax.lax.dynamic_slice(pad, (R + dy, R + dx),
                                            (self.h, self.w))
            d = jnp.abs(sy - shifted)
            return d.reshape(gh, cu, gw, cu).sum(axis=(1, 3))

        # chunked map: vmap CH shifts per scan step (single sequential map
        # over 1089 offsets leaves the VPU idle; CH-wide batches keep it fed
        # without materialising 1089 full planes at once)
        CH = 33
        n_off = side * side
        n_pad = -(-n_off // CH) * CH
        ks_all = jnp.arange(n_pad, dtype=jnp.int32).reshape(-1, CH)
        ks_all = jnp.minimum(ks_all, n_off - 1)
        sads = jax.lax.map(jax.vmap(sad_k), ks_all).reshape(-1, gh, gw)
        sads = sads[:n_off]
        g = jnp.argmin(sads.sum(axis=(1, 2)))
        prior = jnp.stack([4 * (g % side - R), 4 * (g // side - R)]) \
            .astype(jnp.int32)
        ks = jnp.arange(side * side, dtype=jnp.int32)
        rate = (mvd_bits[jnp.abs(4 * (ks % side - R) - prior[0])]
                + mvd_bits[jnp.abs(4 * (ks // side - R) - prior[1])])
        cost = sads + ((lam16 * rate) >> 4)[:, None, None]
        best_idx = jnp.argmin(cost.reshape(side * side, -1), axis=0) \
            .reshape(gh, gw).astype(jnp.int32)
        dyx = jnp.stack([best_idx // side - R, best_idx % side - R], axis=-1)
        mvs = (jnp.stack([dyx[..., 1], dyx[..., 0]], axis=-1) * 4) \
            .reshape(gh * gw, 2)                            # qpel (x, y)

        # ---- sub-pel refinement (half then quarter) ----
        from homerhevc_tpu.ops.interp import mc_chroma_batch, mc_luma_batch
        B = gh * gw
        padL = R + 8
        ref_padL = jnp.pad(ry, padL, mode="edge")
        x0s = (jnp.arange(B) % gw) * cu
        y0s = (jnp.arange(B) // gw) * cu
        src_blk = sy.reshape(gh, cu, gw, cu).transpose(0, 2, 1, 3) \
            .reshape(B, cu, cu)
        me_prec = int(self.cfg.motion_estimation_precision)

        def refine(mv_cur, step):
            bc = jnp.full((B,), 1 << 30, jnp.int32)
            bmv = mv_cur
            for dy in (-step, 0, step):
                for dx in (-step, 0, step):
                    cand = mv_cur + jnp.asarray([dx, dy], jnp.int32)
                    p = mc_luma_batch(ref_padL, padL, x0s, y0s, cu, cand)
                    sad = jnp.sum(jnp.abs(src_blk - p), axis=(-1, -2))
                    rt = (mvd_bits[jnp.abs(cand[:, 0] - prior[0])]
                          + mvd_bits[jnp.abs(cand[:, 1] - prior[1])])
                    cost = sad + ((lam16 * rt) >> 4)
                    better = cost < bc
                    bc = jnp.where(better, cost, bc)
                    bmv = jnp.where(better[:, None], cand, bmv)
            return bmv

        if me_prec >= 1:
            mvs = refine(mvs, 2)
        if me_prec >= 2:
            mvs = refine(mvs, 1)

        # ---- luma MC + residual ----
        pred = mc_luma_batch(ref_padL, padL, x0s, y0s, cu, mvs)
        resid = src_blk - pred
        coef = forward_transform(resid, False)
        lvl = quantize(coef, cu, self.qp, False, self.ps.scaling_list_enabled)
        if self.ps.sign_hiding:
            lvl = sign_bit_hiding(lvl, coef, cu, self.qp, False, 0,
                                  self.ps.scaling_list_enabled)
        deq = dequantize(lvl, cu, self.qp, False, self.ps.scaling_list_enabled)
        rres = inverse_transform(deq, False)
        lvl, rres = self._zero_force(resid, lvl, rres, zf_mult)
        nz = jnp.any(lvl != 0, axis=(-1, -2))
        rec = jnp.where(nz[:, None, None],
                        jnp.clip(pred + rres, 0, 255), pred)

        # ---- chroma MC (batched per-CU fractional filters) + residual ----
        padC = R // 2 + 4
        cx0s, cy0s = x0s // 2, y0s // 2

        def chroma(src_c, ref_c):
            ref_padC = jnp.pad(ref_c.astype(jnp.int32), padC, mode="edge")
            predc = mc_chroma_batch(ref_padC, padC, cx0s, cy0s, cuc, mvs)
            src_cb = src_c.astype(jnp.int32).reshape(
                gh, cuc, gw, cuc).transpose(0, 2, 1, 3).reshape(B, cuc, cuc)
            resc = src_cb - predc
            coefc = forward_transform(resc, False)
            lvlc = quantize(coefc, cuc, self.qp_c, False,
                            self.ps.scaling_list_enabled)
            if self.ps.sign_hiding:
                lvlc = sign_bit_hiding(lvlc, coefc, cuc, self.qp_c, False, 0,
                                       self.ps.scaling_list_enabled)
            deqc = dequantize(lvlc, cuc, self.qp_c, False,
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
            return blocks.reshape(gh, gw, n, n).transpose(0, 2, 1, 3) \
                .reshape(hh, ww)
        recon_y = unblock(rec, cu, self.h, self.w)
        recon_u = unblock(rec_u, cuc, self.h // 2, self.w // 2)
        recon_v = unblock(rec_v, cuc, self.h // 2, self.w // 2)
        ly = unblock(lvl.astype(jnp.int16), cu, self.h, self.w)
        lu = unblock(lvl_u.astype(jnp.int16), cuc, self.h // 2, self.w // 2)
        lv = unblock(lvl_v.astype(jnp.int16), cuc, self.h // 2, self.w // 2)
        return (recon_y.astype(jnp.uint8), recon_u.astype(jnp.uint8),
                recon_v.astype(jnp.uint8),
                mvs.reshape(gh, gw, 2).astype(jnp.int16), ly, lu, lv)

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

    def encode_frame(self, src, ref, is_b: bool = False,
                     avg_dist: float = 1000.0):
        from homerhevc_tpu.golden.inter_frame import zf_multiplier
        y, u, v = src
        ry, ru, rv = ref
        zf_mult = zf_multiplier(avg_dist, self.qp)
        out = self._jit(jnp.asarray(np.asarray(y, np.uint8)),
                        jnp.asarray(np.asarray(u, np.uint8)),
                        jnp.asarray(np.asarray(v, np.uint8)),
                        jnp.asarray(np.asarray(ry, np.uint8)),
                        jnp.asarray(np.asarray(ru, np.uint8)),
                        jnp.asarray(np.asarray(rv, np.uint8)),
                        jnp.float32(zf_mult))
        recon_y, recon_u, recon_v, mvs, ly, lu, lv = map(np.asarray, out)
        cu = self.cu
        desc = FrameDesc.alloc(self.w, self.h)
        desc.pred_mode[:] = MODE_INTER
        desc.cu_depth[:] = self.ps.log2_ctu - (cu.bit_length() - 1)
        r8 = cu // 8
        desc.mv[:] = np.repeat(np.repeat(mvs.astype(np.int32), r8, 0), r8, 1)
        desc.coef_y[:] = ly
        desc.coef_u[:] = lu
        desc.coef_v[:] = lv
        select_inter_syntax(self.ps, desc, cu, is_b=is_b)
        return (desc, recon_y.astype(np.int32), recon_u.astype(np.int32),
                recon_v.astype(np.int32))
