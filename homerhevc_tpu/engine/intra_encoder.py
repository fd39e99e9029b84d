"""TPU wavefront intra frame encoder.

Replaces the reference's WPP pthread wavefront (hmr_encoder_lib.c:2849) with
a batched anti-diagonal schedule: all CUs with d = gx + 2*gy are mutually
independent (their left / above / above-right dependencies lie on earlier
diagonals), so each diagonal is one batched jitted step over the device.

v1 design: uniform CU grid (cu size 16 by default — frame dims must divide),
one TU per CU, DM chroma, closed-loop recon. Decisions are bit-exact to the
golden numpy encoder (tests/test_tpu_intra.py) so streams stay conformant.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from homerhevc_tpu.config import EncoderConfig
from homerhevc_tpu.golden.intra_pred import Availability
from homerhevc_tpu.hevc import tables as T
from homerhevc_tpu.hevc.headers import ParamSets
from homerhevc_tpu.hevc.syntax import FrameDesc, mpm_candidates
from homerhevc_tpu.ops import intra as dip
from homerhevc_tpu.ops.quant import dequantize, quantize, sign_bit_hiding
from homerhevc_tpu.ops.transform import forward_transform, inverse_transform


def _mpm_jax(left_mode: jnp.ndarray, above_mode: jnp.ndarray) -> jnp.ndarray:
    """Vectorized spec 8.4.2.2 candModeList; inputs (B,), output (B, 3)."""
    a, b = left_mode.astype(jnp.int32), above_mode.astype(jnp.int32)
    eq = a == b
    # a == b case
    lt2 = a < 2
    eq0 = jnp.where(lt2, 0, a)
    eq1 = jnp.where(lt2, 1, 2 + ((a + 29) % 32))
    eq2 = jnp.where(lt2, 26, 2 + ((a - 1) % 32))
    # a != b case
    ne0, ne1 = a, b
    has_planar = (a == 0) | (b == 0)
    has_dc = (a == 1) | (b == 1)
    ne2 = jnp.where(~has_planar, 0, jnp.where(~has_dc, 1, 26))
    c0 = jnp.where(eq, eq0, ne0)
    c1 = jnp.where(eq, eq1, ne1)
    c2 = jnp.where(eq, eq2, ne2)
    return jnp.stack([c0, c1, c2], axis=-1)


def _split_planes(buf: np.ndarray, shapes):
    """Contiguous plane views over one flat int16 buffer (no copies)."""
    planes, off = [], 0
    for h, w in shapes:
        planes.append(buf[off:off + h * w].reshape(h, w))
        off += h * w
    return planes


def _parse_cg_wire(meta_np: np.ndarray, off: int, n_tot: int, pack_C: int,
                   cg_C: int, E: int):
    """Split the per-frame CG wire out of a (F, meta_len) uint8 buffer
    starting at byte `off`. Layout (pack_sparse_cg order): cg_bitmap
    (n/128), masks16 (2*cg_C), codes (pack_C/4), esc_idx (4E),
    esc_val (2E), count/esc_count/cg_count (3 x int32)."""
    o = off
    cg_bitmaps = meta_np[:, o:o + n_tot // 128]
    o += n_tot // 128
    masks = meta_np[:, o:o + 2 * cg_C].copy().view(np.int16)
    o += 2 * cg_C
    codes = meta_np[:, o:o + pack_C // 4]
    o += pack_C // 4
    esc_idx = meta_np[:, o:o + E * 4].copy().view(np.int32)
    o += E * 4
    esc_val = meta_np[:, o:o + E * 2].copy().view(np.int16)
    o += E * 2
    tail = meta_np[:, o:o + 12].copy().view(np.int32)
    return (cg_bitmaps, masks, codes, esc_idx, esc_val,
            tail[:, 0], tail[:, 1], tail[:, 2], pack_C, cg_C, E)


def _unpack_cg_frame(wire, i: int, n_tot: int, shapes, full_fallback):
    """Expand frame i of a parsed CG wire into int16 planes; on capacity
    overflow call full_fallback() for the device-resident full planes."""
    (cg_bitmaps, masks, codes, esc_idx, esc_val, counts, esc_counts,
     cg_counts, pack_C, cg_C, E) = wire
    cnt, ec, cc = int(counts[i]), int(esc_counts[i]), int(cg_counts[i])
    if cnt > pack_C or ec > E or cc > cg_C:
        return full_fallback()
    from homerhevc_tpu.native import unpack_sparse_cg_native
    buf = np.empty(n_tot, np.int16)
    if unpack_sparse_cg_native(cg_bitmaps[i], masks[i], codes[i], cnt, cc,
                               esc_idx[i, :ec], esc_val[i, :ec], n_tot,
                               buf, shapes):
        return _split_planes(buf, shapes)
    from homerhevc_tpu.ops.pack import unpack_sparse_cg
    return unpack_sparse_cg(cg_bitmaps[i], masks[i], codes[i], cnt, cc,
                            esc_idx[i, :ec], esc_val[i, :ec], shapes)


def _wire_frame(wire, i: int, shapes):
    """Frame i of a parsed CG wire as a FrameDesc.cg_wire tuple (the
    native serializer codes residuals straight off it — no dense unpack).
    Returns None when the frame overflowed a static wire capacity; the
    caller falls back to dense planes."""
    (cg_bitmaps, masks, codes, esc_idx, esc_val, counts, esc_counts,
     cg_counts, pack_C, cg_C, E) = wire
    cnt, ec, cc = int(counts[i]), int(esc_counts[i]), int(cg_counts[i])
    if cnt > pack_C or ec > E or cc > cg_C:
        return None
    return (cg_bitmaps[i], masks[i], codes[i], esc_idx[i, :ec],
            esc_val[i, :ec], cnt, ec, cc, shapes)


class _DeviceSlice:
    """Lazy view of frame i of a batched device array. Slicing a device
    array dispatches a device op, and each op costs a full link round
    trip (~30 ms on the tunnel) — so the slice happens only if a consumer
    actually materializes the data (np.asarray)."""

    def __init__(self, arr, i):
        self.arr, self.i = arr, i

    def __array__(self, dtype=None, copy=None):
        a = np.asarray(self.arr[self.i])
        return a.astype(dtype) if dtype is not None else a


# per-QP intra mode-cost constants (derived from the I-slice lambda), as
# lookup tables so QP can be a traced device input
_BITS_MPM = np.asarray(
    [int(float(np.sqrt(T.rd_lambda(q, "I"))) * 2) for q in range(52)],
    np.int32)
_BITS_REM = np.asarray(
    [int(float(np.sqrt(T.rd_lambda(q, "I"))) * 6) for q in range(52)],
    np.int32)


class TpuIntraEncoder:
    """Wavefront all-intra encoder. One instance per (frame size, cu size,
    flags) — QP is a traced input (per frame), so one compiled program
    serves every QP; everything static is precomputed at init."""

    def __init__(self, ps: ParamSets, cfg: EncoderConfig, cu: int = 16):
        # persistent compilation cache: the whole-frame scan program is big
        # (~200s compile on the axon tunnel) but static per geometry
        from homerhevc_tpu.utils.jaxcache import enable_compile_cache
        enable_compile_cache()
        self.ps = ps
        self.cfg = cfg
        w, h = cfg.width, cfg.height
        assert w % cu == 0 and h % cu == 0, \
            f"device path needs dims divisible by {cu}"
        self.cu = cu
        self.w, self.h = w, h
        self.gw, self.gh = w // cu, h // cu
        from homerhevc_tpu.ops.pack import cg_cap, pack_capacity
        # capacities sized from the nominal QP with headroom for RC dips
        # (overflow falls back to full-plane fetches)
        self.pack_C = pack_capacity(w * h * 3 // 2, max(0, cfg.qp - 4))
        self.cg_C = cg_cap(w * h * 3 // 2, max(0, cfg.qp - 4))
        self._build_static()
        # frame-batched variant: the wavefront is latency-bound (one small
        # step per diagonal); vmapping F independent frames through the same
        # scan amortizes the per-step overhead — the single-chip analog of
        # the reference's frame-level "encoder engines". QP is vmapped too:
        # each frame in a batch may carry its own QP (VBR/CBR).
        self._encode_batch_jit = jax.jit(jax.vmap(self._encode_frame_impl))
        # packed-upload variant: the whole batch arrives as ONE (F, n_tot)
        # uint8 buffer and is split into planes on device. The tunnel is
        # latency-bound per transfer (~50 ms/op), so one 33 MB upload beats
        # 3*F small ones by an order of magnitude.
        wh = self.w * self.h

        def _packed(batch_u8, qps):
            y = batch_u8[:, :wh].reshape(-1, self.h, self.w)
            u = batch_u8[:, wh:wh + wh // 4].reshape(
                -1, self.h // 2, self.w // 2)
            v = batch_u8[:, wh + wh // 4:].reshape(
                -1, self.h // 2, self.w // 2)
            return jax.vmap(self._encode_frame_impl)(y, u, v, qps)
        self._encode_packed_jit = jax.jit(_packed)

    # -- static geometry -----------------------------------------------------

    def _build_static(self):
        cu, gw, gh = self.cu, self.gw, self.gh
        ps = self.ps
        avail = Availability(self.w, self.h, ps.ctu_size)
        n2 = 2 * cu
        L = 2 * n2 + 1  # substitution sequence length
        diag_of = lambda gx, gy: gx + 2 * gy
        ndiag = (gw - 1) + 2 * (gh - 1) + 1
        groups = [[] for _ in range(ndiag)]
        for gy in range(gh):
            for gx in range(gw):
                groups[diag_of(gx, gy)].append((gx, gy))
        maxb = max(len(g) for g in groups)
        self.ndiag, self.maxb = ndiag, maxb

        # per-diagonal CU coordinates, padded; invalid slots flagged
        gxs = np.zeros((ndiag, maxb), np.int32)
        gys = np.zeros((ndiag, maxb), np.int32)
        valid = np.zeros((ndiag, maxb), bool)
        for d, g in enumerate(groups):
            for i, (gx, gy) in enumerate(g):
                gxs[d, i], gys[d, i], valid[d, i] = gx, gy, True
        self.gxs, self.gys, self.valid = gxs, gys, valid

        # per-CU-position availability masks for luma (L) and chroma (L)
        # sequence order: [left bottom..top (2n), corner, top left..right (2n)]
        def masks_for(comp_shift):
            n = cu >> comp_shift
            nn2 = 2 * n
            ll = 2 * nn2 + 1
            m = np.zeros((gh, gw, ll), bool)
            wC, hC = self.w >> comp_shift, self.h >> comp_shift
            for gy in range(gh):
                for gx in range(gw):
                    x0, y0 = gx * n, gy * n
                    for j in range(nn2):
                        yy, xx = y0 + nn2 - 1 - j, x0 - 1
                        m[gy, gx, j] = (yy < hC and xx >= 0 and
                                        avail.available(x0 << comp_shift, y0 << comp_shift,
                                                        xx << comp_shift, yy << comp_shift))
                    m[gy, gx, nn2] = (x0 > 0 and y0 > 0)
                    for i in range(nn2):
                        xx, yy = x0 + i, y0 - 1
                        m[gy, gx, nn2 + 1 + i] = (xx < wC and yy >= 0 and
                                                  avail.available(x0 << comp_shift, y0 << comp_shift,
                                                                  xx << comp_shift, yy << comp_shift))
            return m
        self.mask_y = masks_for(0)
        self.mask_c = masks_for(1)

        # above-mode availability for MPM: inside frame AND same CTU row
        ctu = ps.ctu_size
        above_ok = np.zeros((gh, gw), bool)
        for gy in range(gh):
            for gx in range(gw):
                y0 = gy * cu
                above_ok[gy, gx] = y0 > 0 and (y0 % ctu) != 0
        self.above_ok = above_ok

        # ---- diagonal-slot layout (slot = gy) ----------------------------
        # Block (gx, gy) on diagonal d = gx + 2*gy; with slot index s = gy
        # its wavefront neighbors live at FIXED slots of the previous
        # diagonals: left (gx-1,gy) = (d-1, s), above-right (gx+1,gy-1) =
        # (d-1, s-1), above (gx,gy-1) = (d-2, s-1), above-left (gx-1,gy-1)
        # = (d-3, s-1). The scan carry therefore only holds the boundary
        # rows/cols of the last three diagonals and every neighbor access
        # is a shifted slice -- no gather/scatter in the hot loop (TPU
        # scatters serialize; they dominated the v1 step cost).
        sl = np.arange(gh)[None, :]
        dd = np.arange(ndiag)[:, None]
        d_gx = dd - 2 * sl                                  # (ndiag, gh)
        d_valid = (d_gx >= 0) & (d_gx < gw)
        gx_c = np.clip(d_gx, 0, gw - 1)
        gy_b = np.broadcast_to(sl, d_gx.shape)
        self.d_valid = d_valid
        self.d_has_left = d_valid & (d_gx > 0)
        self.d_above_ok = np.where(d_valid, above_ok[gy_b, gx_c], False)
        self.d_mask_y = np.where(d_valid[..., None],
                                 self.mask_y[gy_b, gx_c], False)
        self.d_mask_c = np.where(d_valid[..., None],
                                 self.mask_c[gy_b, gx_c], False)
        # flat block index for source gather / output scatter (invalid ->
        # one-past-the-end padding row)
        self.d_flat = np.where(d_valid, gy_b * gw + gx_c, gh * gw) \
            .astype(np.int32)

    # -- ref-vector helpers (inside jit) --------------------------------------

    @staticmethod
    def _seq_to_refs(seq, n):
        """Substituted sequence -> (top[2n+1], left[2n+1]) corner-first."""
        n2 = 2 * n
        left = seq[:, :n2][:, ::-1]
        corner = seq[:, n2:n2 + 1]
        top = seq[:, n2 + 1:]
        return (jnp.concatenate([corner, top], axis=1),
                jnp.concatenate([corner, left], axis=1))

    def _scan_class(self, modes: jnp.ndarray, n: int, is_luma: bool):
        """Scan index (0 diag, 1 hor, 2 ver) per block, matching
        tables.intra_scan_idx."""
        log2n = n.bit_length() - 1
        if not (log2n == 2 or (log2n == 3 and is_luma)):
            return jnp.zeros_like(modes)
        ver = (modes >= 6) & (modes <= 14)
        hor = (modes >= 22) & (modes <= 30)
        return jnp.where(ver, 2, jnp.where(hor, 1, 0)).astype(jnp.int32)

    # -- whole-frame jit (one device dispatch per frame) -------------------------
    #
    # Performance-critical design: the scan runs over diagonals in the
    # diagonal-slot layout (slot = gy, see _build_static). The carry holds
    # only the boundary rows/cols of the last three diagonals, and every
    # neighbor access is a shifted slice of those vectors — zero gathers
    # and zero scatters inside the hot loop. Reconstructed blocks and
    # levels stream out as stacked scan outputs and are assembled into
    # planes with one scatter per tensor at the end.

    @staticmethod
    def _sh1(a):
        """Shift along the slot axis: out[s] = a[s-1], out[0] = 0."""
        return jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], axis=0)

    def _refs_from_prev(self, p1_brow, p1_rcol, p2_brow, p3_brow, n, mask):
        """Substituted (top[2n+1], left[2n+1]) per slot from the boundary
        vectors of the previous three diagonals."""
        gh = p1_brow.shape[0]
        top1 = self._sh1(p2_brow)             # above (d-2, s-1)
        top2 = self._sh1(p1_brow)             # above-right (d-1, s-1)
        corner = self._sh1(p3_brow)[:, -1:]   # above-left (d-3, s-1)
        leftc = p1_rcol                       # left (d-1, s), top..bottom
        zeros = jnp.zeros((gh, n), jnp.int32)
        # substitution sequence: [below-left, left bottom..top, corner, top]
        seq = jnp.concatenate(
            [zeros, leftc[:, ::-1], corner, top1, top2], axis=1)
        seq = dip.substitute_refs(seq, mask)
        return self._seq_to_refs(seq, n)

    def _encode_frame_impl(self, src_y, src_u, src_v, qp):
        cu, cuc = self.cu, self.cu // 2
        gw, gh = self.gw, self.gh
        ndiag = self.ndiag
        qp = qp.astype(jnp.int32)
        qp_c = jnp.asarray(T.CHROMA_QP_MAP)[
            jnp.clip(qp + self.ps.cb_qp_offset, 0, 57)]
        bits_mpm = jnp.asarray(_BITS_MPM)[qp]
        bits_rem = jnp.asarray(_BITS_REM)[qp]

        # block the sources and pre-gather into the diagonal-slot layout
        # (one gather per component per frame; uint8 until inside the scan)
        def diag_blocks(plane, n):
            hh, ww = plane.shape
            b = plane.reshape(hh // n, n, ww // n, n).transpose(0, 2, 1, 3) \
                .reshape(-1, n, n)
            b = jnp.concatenate([b, jnp.zeros((1, n, n), b.dtype)], axis=0)
            return b[jnp.asarray(self.d_flat)]       # (ndiag, gh, n, n)
        by = diag_blocks(src_y, cu)
        bu = diag_blocks(src_u, cuc)
        bv = diag_blocks(src_v, cuc)

        mask_y_all = jnp.asarray(self.d_mask_y)
        mask_c_all = jnp.asarray(self.d_mask_c)
        above_all = jnp.asarray(self.d_above_ok)
        has_left_all = jnp.asarray(self.d_has_left)

        def component(best, src_blk, refs, n, qp, is_luma, preds_cache=None):
            """TU pipeline for one component; returns lvl, rec."""
            if preds_cache is None:
                top, left = refs
                preds = dip.predict_all_modes(top, left, n, is_luma)
            else:
                preds = preds_cache
            pred = jnp.take_along_axis(
                preds, best[:, None, None, None], axis=1)[:, 0]
            resid = src_blk - pred
            is_dst = is_luma and n == 4
            coef = forward_transform(resid, is_dst)
            lvl = quantize(coef, n, qp, True, self.ps.scaling_list_enabled)
            if self.ps.sign_hiding:
                scan_sel = self._scan_class(best, n, is_luma)
                lvl = self._sbh_by_scan_q(lvl, coef, n, qp, scan_sel, is_luma)
            deq = dequantize(lvl, n, qp, True, self.ps.scaling_list_enabled)
            rres = inverse_transform(deq, is_dst)
            any_nz = jnp.any(lvl != 0, axis=(-1, -2))
            rec = jnp.where(any_nz[:, None, None],
                            jnp.clip(pred + rres, 0, 255), pred)
            return lvl, rec

        def body(carry, xs):
            (p1b, p1r, p2b, p3b,
             p1b_u, p1r_u, p2b_u, p3b_u,
             p1b_v, p1r_v, p2b_v, p3b_v,
             p1m, p2m) = carry
            sb_y, sb_u, sb_v, mask_y, mask_c, above_ok, has_left = xs
            src_blk = sb_y.astype(jnp.int32)
            # ---- luma mode decision ----
            top, left = self._refs_from_prev(p1b, p1r, p2b, p3b, cu, mask_y)
            preds = dip.predict_all_modes(top, left, cu, True)
            preds = dip.edge_fixes(preds, top, left, cu, True)
            sad = jnp.sum(jnp.abs(src_blk[:, None] - preds), axis=(-1, -2))
            left_mode = jnp.where(has_left, p1m, 1)
            above_mode = jnp.where(above_ok, self._sh1(p2m), 1)
            mpm = _mpm_jax(left_mode, above_mode)
            modes_r = jnp.arange(35)[None, :]
            in_mpm = jnp.any(modes_r[..., None] == mpm[:, None, :], axis=-1)
            cost = sad + jnp.where(in_mpm, bits_mpm, bits_rem)
            best = jnp.argmin(cost, axis=-1).astype(jnp.int32)

            lvl, rec = component(best, src_blk, None, cu, qp, True,
                                 preds_cache=preds)
            refs_u = self._refs_from_prev(p1b_u, p1r_u, p2b_u, p3b_u, cuc,
                                          mask_c)
            lvl_u, rec_u = component(best, sb_u.astype(jnp.int32), refs_u,
                                     cuc, qp_c, False)
            refs_v = self._refs_from_prev(p1b_v, p1r_v, p2b_v, p3b_v, cuc,
                                          mask_c)
            lvl_v, rec_v = component(best, sb_v.astype(jnp.int32), refs_v,
                                     cuc, qp_c, False)

            carry = (rec[:, -1, :], rec[:, :, -1], p1b, p2b,
                     rec_u[:, -1, :], rec_u[:, :, -1], p1b_u, p2b_u,
                     rec_v[:, -1, :], rec_v[:, :, -1], p1b_v, p2b_v,
                     best, p1m)
            return carry, (rec, rec_u, rec_v, lvl, lvl_u, lvl_v, best)

        zs = lambda n: jnp.zeros((gh, n), jnp.int32)
        carry0 = (zs(cu), zs(cu), zs(cu), zs(cu),
                  zs(cuc), zs(cuc), zs(cuc), zs(cuc),
                  zs(cuc), zs(cuc), zs(cuc), zs(cuc),
                  jnp.ones((gh,), jnp.int32), jnp.ones((gh,), jnp.int32))
        xs = (by, bu, bv, mask_y_all, mask_c_all, above_all, has_left_all)
        carry, outs = jax.lax.scan(body, carry0, xs)
        rec, rec_u, rec_v, lvl, lvl_u, lvl_v, best = outs

        # assemble planes: one scatter per output tensor
        flat_idx = jnp.asarray(self.d_flat)
        mode_grid = jnp.zeros((gh * gw + 1,), jnp.int32) \
            .at[flat_idx.reshape(-1)].set(best.reshape(-1), mode="drop") \
            [:gh * gw].reshape(gh, gw)

        def assemble(blocks, n, hh, ww):
            buf = jnp.zeros((gh * gw + 1, n, n), blocks.dtype)
            buf = buf.at[flat_idx.reshape(-1)].set(
                blocks.reshape(-1, n, n), mode="drop")
            return buf[:gh * gw].reshape(gh, gw, n, n) \
                .transpose(0, 2, 1, 3).reshape(hh, ww)
        # in-loop deblocking on device (post full-frame; intra prediction
        # correctly used the pre-deblock samples above)
        if self.ps.deblocking_enabled:
            from homerhevc_tpu.ops.deblock import (
                deblock_chroma_uniform, deblock_luma_uniform)
            ry = assemble(rec, cu, self.h, self.w)
            ru = assemble(rec_u, cuc, self.h // 2, self.w // 2)
            rv = assemble(rec_v, cuc, self.h // 2, self.w // 2)
            ry = deblock_luma_uniform(ry, cu, qp)
            ru = deblock_chroma_uniform(ru, cu, qp, self.ps.cb_qp_offset)
            rv = deblock_chroma_uniform(rv, cu, qp, self.ps.cr_qp_offset)
            recon_y, recon_u, recon_v = (ry.astype(jnp.uint8),
                                         ru.astype(jnp.uint8),
                                         rv.astype(jnp.uint8))
        else:
            recon_y = assemble(rec.astype(jnp.uint8), cu, self.h, self.w)
            recon_u = assemble(rec_u.astype(jnp.uint8), cuc,
                               self.h // 2, self.w // 2)
            recon_v = assemble(rec_v.astype(jnp.uint8), cuc,
                               self.h // 2, self.w // 2)
        ly = assemble(lvl.astype(jnp.int16), cu, self.h, self.w)
        lu = assemble(lvl_u.astype(jnp.int16), cuc, self.h // 2, self.w // 2)
        lv = assemble(lvl_v.astype(jnp.int16), cuc, self.h // 2, self.w // 2)
        # compact wire format for the host CABAC handoff; the full planes
        # are still returned as a device-resident fallback (only fetched
        # when the packed capacity overflows). Two-tier CG wire: per-4x4
        # group presence bits + compacted 16-bit masks + 2-bit level
        # codes + escape list (ops/pack.py pack_sparse_cg). Everything
        # rides in ONE uint8 buffer — the link is latency-bound per
        # transfer, so all per-batch wire data is one fetch.
        from homerhevc_tpu.ops.pack import pack_sparse_cg
        cg_bitmap, masks16, codes, esc_idx, esc_val, count, esc_count, \
            cg_count = pack_sparse_cg([ly, lu, lv], self.pack_C, self.cg_C)

        def u8(a):
            if a.dtype == jnp.uint8:
                return a.reshape(-1)
            return jax.lax.bitcast_convert_type(a, jnp.uint8).reshape(-1)
        meta = jnp.concatenate(
            [mode_grid.astype(jnp.uint8).reshape(-1), cg_bitmap,
             u8(masks16), codes, u8(esc_idx), u8(esc_val),
             u8(count.reshape(1)), u8(esc_count.reshape(1)),
             u8(cg_count.reshape(1))])
        return recon_y, recon_u, recon_v, ly, lu, lv, meta

    def _encode_frame_impl_aq(self, src_y, src_u, src_v, qp, qp_map):
        """AQ twin of _encode_frame_impl: qp_map (gh, gw) int32 carries
        per-CTB(=CU16) luma QPs (per-CTB adaptive quantization). The
        per-diagonal slot QP vectors ride the scan inputs; quant/dequant/
        SBH take per-block QP vectors (ops/quant.py). Kept as a separate
        trace so the flat-QP program (the bench path) is untouched.
        Requires deblocking OFF (the decoder's deblock QP would need the
        effective-QP inference; the host paths cover deblock+AQ)."""
        assert not self.ps.deblocking_enabled
        cu, cuc = self.cu, self.cu // 2
        gw, gh = self.gw, self.gh
        ndiag = self.ndiag
        qp = qp.astype(jnp.int32)
        flat_q = jnp.concatenate([qp_map.reshape(-1).astype(jnp.int32),
                                  qp.reshape(1)])       # pad slot -> slice qp
        qp_diag = flat_q[jnp.asarray(self.d_flat)]       # (ndiag, gh)
        qpc_diag = jnp.asarray(T.CHROMA_QP_MAP)[
            jnp.clip(qp_diag + self.ps.cb_qp_offset, 0, 57)]
        bits_mpm_d = jnp.asarray(_BITS_MPM)[qp_diag]     # (ndiag, gh)
        bits_rem_d = jnp.asarray(_BITS_REM)[qp_diag]

        def diag_blocks(plane, n):
            hh, ww = plane.shape
            b = plane.reshape(hh // n, n, ww // n, n).transpose(0, 2, 1, 3) \
                .reshape(-1, n, n)
            b = jnp.concatenate([b, jnp.zeros((1, n, n), b.dtype)], axis=0)
            return b[jnp.asarray(self.d_flat)]
        by = diag_blocks(src_y, cu)
        bu = diag_blocks(src_u, cuc)
        bv = diag_blocks(src_v, cuc)

        mask_y_all = jnp.asarray(self.d_mask_y)
        mask_c_all = jnp.asarray(self.d_mask_c)
        above_all = jnp.asarray(self.d_above_ok)
        has_left_all = jnp.asarray(self.d_has_left)

        def component(best, src_blk, refs, n, qp_vec, is_luma,
                      preds_cache=None):
            if preds_cache is None:
                top, left = refs
                preds = dip.predict_all_modes(top, left, n, is_luma)
            else:
                preds = preds_cache
            pred = jnp.take_along_axis(
                preds, best[:, None, None, None], axis=1)[:, 0]
            resid = src_blk - pred
            is_dst = is_luma and n == 4
            coef = forward_transform(resid, is_dst)
            lvl = quantize(coef, n, qp_vec, True,
                           self.ps.scaling_list_enabled)
            if self.ps.sign_hiding:
                scan_sel = self._scan_class(best, n, is_luma)
                lvl = self._sbh_by_scan_q(lvl, coef, n, qp_vec, scan_sel,
                                          is_luma)
            deq = dequantize(lvl, n, qp_vec, True,
                             self.ps.scaling_list_enabled)
            rres = inverse_transform(deq, is_dst)
            any_nz = jnp.any(lvl != 0, axis=(-1, -2))
            rec = jnp.where(any_nz[:, None, None],
                            jnp.clip(pred + rres, 0, 255), pred)
            return lvl, rec

        def body(carry, xs):
            (p1b, p1r, p2b, p3b,
             p1b_u, p1r_u, p2b_u, p3b_u,
             p1b_v, p1r_v, p2b_v, p3b_v,
             p1m, p2m) = carry
            (sb_y, sb_u, sb_v, mask_y, mask_c, above_ok, has_left,
             qp_vec, qpc_vec, b_mpm, b_rem) = xs
            src_blk = sb_y.astype(jnp.int32)
            top, left = self._refs_from_prev(p1b, p1r, p2b, p3b, cu, mask_y)
            preds = dip.predict_all_modes(top, left, cu, True)
            preds = dip.edge_fixes(preds, top, left, cu, True)
            sad = jnp.sum(jnp.abs(src_blk[:, None] - preds), axis=(-1, -2))
            left_mode = jnp.where(has_left, p1m, 1)
            above_mode = jnp.where(above_ok, self._sh1(p2m), 1)
            mpm = _mpm_jax(left_mode, above_mode)
            modes_r = jnp.arange(35)[None, :]
            in_mpm = jnp.any(modes_r[..., None] == mpm[:, None, :], axis=-1)
            cost = sad + jnp.where(in_mpm, b_mpm[:, None], b_rem[:, None])
            best = jnp.argmin(cost, axis=-1).astype(jnp.int32)

            lvl, rec = component(best, src_blk, None, cu, qp_vec, True,
                                 preds_cache=preds)
            refs_u = self._refs_from_prev(p1b_u, p1r_u, p2b_u, p3b_u, cuc,
                                          mask_c)
            lvl_u, rec_u = component(best, sb_u.astype(jnp.int32), refs_u,
                                     cuc, qpc_vec, False)
            refs_v = self._refs_from_prev(p1b_v, p1r_v, p2b_v, p3b_v, cuc,
                                          mask_c)
            lvl_v, rec_v = component(best, sb_v.astype(jnp.int32), refs_v,
                                     cuc, qpc_vec, False)

            carry = (rec[:, -1, :], rec[:, :, -1], p1b, p2b,
                     rec_u[:, -1, :], rec_u[:, :, -1], p1b_u, p2b_u,
                     rec_v[:, -1, :], rec_v[:, :, -1], p1b_v, p2b_v,
                     best, p1m)
            return carry, (rec, rec_u, rec_v, lvl, lvl_u, lvl_v, best)

        zs = lambda n: jnp.zeros((gh, n), jnp.int32)
        carry0 = (zs(cu), zs(cu), zs(cu), zs(cu),
                  zs(cuc), zs(cuc), zs(cuc), zs(cuc),
                  zs(cuc), zs(cuc), zs(cuc), zs(cuc),
                  jnp.ones((gh,), jnp.int32), jnp.ones((gh,), jnp.int32))
        xs = (by, bu, bv, mask_y_all, mask_c_all, above_all, has_left_all,
              qp_diag, qpc_diag, bits_mpm_d, bits_rem_d)
        carry, outs = jax.lax.scan(body, carry0, xs)
        rec, rec_u, rec_v, lvl, lvl_u, lvl_v, best = outs

        flat_idx = jnp.asarray(self.d_flat)
        mode_grid = jnp.zeros((gh * gw + 1,), jnp.int32) \
            .at[flat_idx.reshape(-1)].set(best.reshape(-1), mode="drop") \
            [:gh * gw].reshape(gh, gw)

        def assemble(blocks, n, hh, ww):
            buf = jnp.zeros((gh * gw + 1, n, n), blocks.dtype)
            buf = buf.at[flat_idx.reshape(-1)].set(
                blocks.reshape(-1, n, n), mode="drop")
            return buf[:gh * gw].reshape(gh, gw, n, n) \
                .transpose(0, 2, 1, 3).reshape(hh, ww)
        recon_y = assemble(rec.astype(jnp.uint8), cu, self.h, self.w)
        recon_u = assemble(rec_u.astype(jnp.uint8), cuc,
                           self.h // 2, self.w // 2)
        recon_v = assemble(rec_v.astype(jnp.uint8), cuc,
                           self.h // 2, self.w // 2)
        ly = assemble(lvl.astype(jnp.int16), cu, self.h, self.w)
        lu = assemble(lvl_u.astype(jnp.int16), cuc, self.h // 2, self.w // 2)
        lv = assemble(lvl_v.astype(jnp.int16), cuc, self.h // 2, self.w // 2)
        from homerhevc_tpu.ops.pack import pack_sparse_cg
        cg_bitmap, masks16, codes, esc_idx, esc_val, count, esc_count, \
            cg_count = pack_sparse_cg([ly, lu, lv], self.pack_C, self.cg_C)

        def u8(a):
            if a.dtype == jnp.uint8:
                return a.reshape(-1)
            return jax.lax.bitcast_convert_type(a, jnp.uint8).reshape(-1)
        meta = jnp.concatenate(
            [mode_grid.astype(jnp.uint8).reshape(-1), cg_bitmap,
             u8(masks16), codes, u8(esc_idx), u8(esc_val),
             u8(count.reshape(1)), u8(esc_count.reshape(1)),
             u8(cg_count.reshape(1))])
        return recon_y, recon_u, recon_v, ly, lu, lv, meta

    def _get_packed_aq_jit(self):
        """Lazily-built packed-batch AQ program (extra qp_maps input)."""
        if getattr(self, "_encode_packed_aq_jit", None) is None:
            wh = self.w * self.h

            def _packed_aq(batch_u8, qps, qp_maps):
                y = batch_u8[:, :wh].reshape(-1, self.h, self.w)
                u = batch_u8[:, wh:wh + wh // 4].reshape(
                    -1, self.h // 2, self.w // 2)
                v = batch_u8[:, wh + wh // 4:].reshape(
                    -1, self.h // 2, self.w // 2)
                return jax.vmap(self._encode_frame_impl_aq)(y, u, v, qps,
                                                            qp_maps)
            self._encode_packed_aq_jit = jax.jit(_packed_aq)
        return self._encode_packed_aq_jit

    def _sbh_by_scan_q(self, lvl, coef, n, qp, scan_sel, is_luma=True):
        """qp may be static or traced (forwarded to sign_bit_hiding)."""
        log2n = n.bit_length() - 1
        mode_dep = log2n == 2 or (log2n == 3 and is_luma)
        if not mode_dep:
            # only the diagonal scan can occur at this size
            return sign_bit_hiding(lvl, coef, n, qp, True, 0,
                                   self.ps.scaling_list_enabled)
        out = lvl
        for s in (0, 1, 2):
            adj = sign_bit_hiding(lvl, coef, n, qp, True, s,
                                  self.ps.scaling_list_enabled)
            out = jnp.where((scan_sel == s)[:, None, None], adj, out)
        return out

    # -- frame driver ------------------------------------------------------------

    def _build_desc(self, mode_grid, ly, lu, lv):
        cu = self.cu
        desc = FrameDesc.alloc(self.w, self.h)
        depth = self.ps.log2_ctu - (cu.bit_length() - 1)
        desc.cu_depth[:] = depth
        desc.tr_depth[:] = 0
        mode_all = np.asarray(mode_grid, np.uint8)
        r = cu // 4
        desc.luma_mode[:] = np.repeat(np.repeat(mode_all, r, 0), r, 1)
        r8 = cu // 8
        desc.chroma_mode[:] = np.repeat(np.repeat(mode_all, r8, 0), r8, 1)
        # direct assignment (views from the native unpack buffer): the
        # serializer only needs contiguous int16, not ownership. ly=None
        # means the caller attaches the CG wire instead (wire-direct
        # serialization; FrameDesc.densify materializes on demand).
        if ly is None:
            desc.coef_y = desc.coef_u = desc.coef_v = None
        else:
            desc.coef_y = np.ascontiguousarray(ly, np.int16)
            desc.coef_u = np.ascontiguousarray(lu, np.int16)
            desc.coef_v = np.ascontiguousarray(lv, np.int16)
        return desc

    def encode_frame(self, y: np.ndarray, u: np.ndarray, v: np.ndarray,
                     qp: int, qp_map=None):
        return self.encode_frames([y], [u], [v], qps=[qp],
                                  qp_maps=None if qp_map is None
                                  else [qp_map])[0]

    def dispatch_frames(self, ys, us, vs, qps=None, qp_maps=None):
        """Async: launch the batched device program, return device arrays
        immediately (jax dispatch is non-blocking). Pair with fetch_frames
        to overlap host serialization with device compute.

        The batch ships as ONE packed (F, w*h*3/2) uint8 upload split into
        planes on device: the link is latency-bound per transfer, so a
        single large copy beats per-plane uploads by ~10x.
        qps: per-frame QP list (defaults to cfg.qp); QP is a device input,
        so mixed-QP batches reuse the same compiled program."""
        if qps is None:
            qps = [self.cfg.qp] * len(ys)
        handle = ys if isinstance(ys, jax.Array) \
            else self.pack_upload(list(zip(ys, us, vs)))
        out = self.dispatch_packed(handle, qps, qp_maps=qp_maps)
        return out

    def pack_upload(self, frames):
        """Pack a batch into one (F, w*h*3/2) uint8 buffer and start the
        host->device transfer (async: returns in ~30 ms while the copy
        streams). Call this FIRST in a drain cycle so the upload hides
        under the previous batch's fetch + serialization."""
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
        from homerhevc_tpu.utils.profiler import PROFILER
        with PROFILER.scope("disp_qp"):
            qp_arr = jnp.asarray(np.asarray(qps, np.int32))
        with PROFILER.scope("disp_jit"):
            if qp_maps is not None:
                maps = jnp.asarray(np.asarray(qp_maps, np.int32))
                out = self._get_packed_aq_jit()(handle, qp_arr, maps)
            else:
                out = self._encode_packed_jit(handle, qp_arr)
        # kick the wire download early: by the time fetch_frames runs
        # (in the background fetch thread, overlapping the previous
        # batch's serialization) it is already in flight. The whole wire
        # (modes + CG bitmap/masks + codes + escapes) is ONE buffer —
        # the tunnel is latency-bound per transfer.
        with PROFILER.scope("disp_async"):
            try:
                out[6].copy_to_host_async()
            except Exception:
                pass
        return out

    def fetch_frames(self, out, n_frames: int, qp_maps=None):
        """Download the compact wire buffer and rebuild FrameDescs;
        reconstruction planes are returned DEVICE-RESIDENT (consumers
        materialize them lazily). qp_maps: host-side per-CTB QP maps of
        an AQ dispatch — attached to each desc for the serializer."""
        from homerhevc_tpu.ops.pack import esc_capacity
        from homerhevc_tpu.utils.profiler import PROFILER
        ry, ru, rv, ly, lu, lv, meta = out
        with PROFILER.scope("fetch_meta"):
            meta_np = np.asarray(meta)             # ONE link transfer
        ng = self.gh * self.gw
        n_tot = self.w * self.h * 3 // 2
        E = esc_capacity(n_tot, self.pack_C)
        modes = meta_np[:, :ng].reshape(n_frames, self.gh, self.gw)
        wire = _parse_cg_wire(meta_np, ng, n_tot, self.pack_C, self.cg_C, E)
        shapes = [(self.h, self.w), (self.h // 2, self.w // 2),
                  (self.h // 2, self.w // 2)]
        results = []
        with PROFILER.scope("fetch_unpack"):
            for i in range(n_frames):
                w8 = _wire_frame(wire, i, shapes)
                if w8 is not None:
                    # wire-direct: no dense unpack; the native serializer
                    # reads the CG wire, python consumers densify lazily
                    desc = self._build_desc(modes[i], None, None, None)
                    desc.cg_wire = w8
                else:
                    py, pu, pv = _unpack_cg_frame(
                        wire, i, n_tot, shapes,
                        lambda: (np.asarray(ly[i]), np.asarray(lu[i]),
                                 np.asarray(lv[i])))
                    desc = self._build_desc(modes[i], py, pu, pv)
                if qp_maps is not None:
                    # per-8x8 targets for the cu_qp_delta serializer (the
                    # device quantized with exactly these per-CTB QPs)
                    m = np.asarray(qp_maps[i], np.int8)
                    r = self.cu // 8
                    desc.qp_map = np.repeat(np.repeat(m, r, 0), r, 1)
                results.append((desc, _DeviceSlice(ry, i),
                                _DeviceSlice(ru, i), _DeviceSlice(rv, i)))
        return results

    def encode_frames(self, ys, us, vs, qps=None, qp_maps=None):
        """Batched: lists/arrays of F frames -> list of (desc, ry, ru, rv)."""
        return self.fetch_frames(
            self.dispatch_frames(ys, us, vs, qps=qps, qp_maps=qp_maps),
            len(ys), qp_maps=qp_maps)
