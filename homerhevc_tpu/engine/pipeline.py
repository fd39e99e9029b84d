"""Encoder pipeline: GOP/POC flow, frame dispatch to the analysis backend,
NAL assembly. Analog of the engine layer (hmr_encoder_lib.c:3132
encoder_engine_thread + HOMER_enc_encode :2989).

Backends:
  - "golden": numpy reference path (tests / oracle)
  - "tpu":    batched JAX wavefront pipeline (engine/intra_encoder.py)
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from homerhevc_tpu.config import EncoderConfig
from homerhevc_tpu.hevc.bitstream import (
    NAL_IDR_W_RADL, NAL_TRAIL_N, NAL_TRAIL_R, make_nal,
)
from homerhevc_tpu.hevc.cabac import CabacEncoder
from homerhevc_tpu.hevc.ctx_tables import init_contexts
from homerhevc_tpu.hevc.headers import (
    SLICE_B, SLICE_I, SLICE_P, ParamSets, SliceParams, write_pps,
    write_slice_header, write_sps, write_vps,
)
from homerhevc_tpu.hevc.syntax import SliceDataEncoder
from homerhevc_tpu.utils.profiler import PROFILER


class _AsyncFetch:
    """Background fetch of a dispatched batch's wire data.

    The device->host transfers and the native unpack both release the
    GIL (jax blocks in C++ during device_get; the unpack is a ctypes
    call), so on this 1-core host they genuinely overlap with the C++
    CABAC serialization of the PREVIOUS batch running on the main
    thread — the host analog of the reference's copy/entropy thread
    split (hmr_encoder_lib.c:2948)."""

    def __init__(self, enc, out, frames, qp, qp_maps=None):
        import threading
        self.frames = frames
        self.qp = qp
        self._result = None
        self._err = None

        def run():
            try:
                self._result = enc.fetch_frames(out, len(frames),
                                                qp_maps=qp_maps)
            except BaseException as e:   # re-raised on join()
                self._err = e
        self._t = threading.Thread(target=run, daemon=True)
        self._t.start()

    def join(self):
        self._t.join()
        if self._err is not None:
            raise self._err
        return self._result, self.frames, self.qp


def _mref(desc, refs_before, poc):
    """(num_ref_l0, ref_dists_l0) for a multi-reference slice, or (1, None)
    when the desc carries no per-CU ref_idx."""
    if getattr(desc, "ref_idx", None) is None:
        return 1, None
    return len(refs_before), tuple(poc - rp for rp in refs_before)


def _ref_dists(poc, refs_before, refs_after, l1_swap):
    """POC(cur) - POC(first entry) of each reference list. L0 leads with
    the closest past ref; L1 leads with the first future ref, or (under
    ref_pic_list_modification l1_swap) the second past ref."""
    refs_before = tuple(refs_before or ())
    refs_after = tuple(refs_after or ())
    if not refs_before and not refs_after:
        return (1, 1)
    l0 = refs_before[0] if refs_before else refs_after[0]
    if refs_after:
        l1 = refs_after[0]
    elif l1_swap and len(refs_before) >= 2:
        l1 = refs_before[1]
    else:
        l1 = refs_before[0]
    return (poc - l0, poc - l1)


class EncoderPipeline:
    def __init__(self, cfg: EncoderConfig, backend: str = "auto"):
        # pad the coded picture to CTU multiples and crop on output via the
        # SPS conformance window (how production encoders handle 1080p with
        # CTB16/32/64): every analysis path then sees uniform full CTBs
        self.out_w, self.out_h = cfg.width, cfg.height
        ctu = cfg.ctu_size
        cw, ch = -(-cfg.width // ctu) * ctu, -(-cfg.height // ctu) * ctu
        if (cw, ch) != (cfg.width, cfg.height):
            import dataclasses
            cfg = dataclasses.replace(cfg, width=cw, height=ch)
        self.cfg = cfg
        self.ps = ParamSets.from_config(cfg)
        self.ps.conf_win_right = cw - self.out_w
        self.ps.conf_win_bottom = ch - self.out_h
        self.poc = 0
        self.backend = backend
        self._tpu_encoder = None
        # frame batching (device throughput): queue frames, analyze in one
        # vmapped device call — the single-chip "encoder engines" analog
        # frame batching only applies to all-intra (P frames chain on the
        # previous reconstruction, like the reference's engine ref-window
        # dependency, hmr_encoder_lib.c:2386)
        self.batch = max(1, cfg.num_frames_in_flight) if cfg.gop_size == 0 else 1
        self._queue: list = []
        self._upload_q: list = []   # packed source batches in transfer
        self._pending_q: list = []  # in-flight device batches (depth 3)
        self._fetch_inflight = None  # _AsyncFetch of the oldest batch
        self._p_pendings: list = []  # in-flight P frames (depth 2)
        self._last_recon = None  # filtered recon planes of previous frame
        self._last_recon_dev = None  # device twin (uint8), IPPP chain only
        self.avg_dist = 1000.0   # reference init, hmr_encoder_lib.c:913
        self.gop_poc = 0
        from homerhevc_tpu.engine.rate_control import RateControl
        self.rc = RateControl(cfg)
        # QP is a traced device input, so ONE compiled program per geometry
        # serves every QP (requirement for CBR/VBR on the device path)
        self._tpu_intra = None
        self._tpu_inter = None

    # ---- frame analysis dispatch ------------------------------------------

    def _analyze_intra(self, y: np.ndarray, u: np.ndarray, v: np.ndarray,
                       qp=None):
        qp = self.cfg.qp if qp is None else qp
        backend = self.backend
        if backend == "auto":
            # device wavefront needs a supported geometry (uniform CTB16 or
            # the CTB32 tree path); otherwise use the golden path
            backend = "tpu" if self._tpu_ok() else "golden"
        self._last_recon_dev = None   # intra breaks the device ref chain
        self._last_recon_dev2 = None
        if backend == "golden":
            from homerhevc_tpu.golden.intra_frame import encode_intra_frame
            with PROFILER.scope("analyze_intra_golden"):
                return self._analyze_intra_golden(y, u, v, qp)
        with PROFILER.scope("analyze_intra_device"):
            enc = self._get_tpu()
            qp_map = self._aq_map(y, qp)
            res = enc.encode_frame(y, u, v, qp, qp_map=qp_map)
            return res

    def _aq_map(self, y, qp):
        """Per-CTB AQ map for the device intra path (None when AQ off or
        the encoder is the tree variant, which runs the fast decision)."""
        if not self.ps.cu_qp_delta_enabled or self._tpu_tree_ok():
            return None
        from homerhevc_tpu.engine.rate_control import aq_qp_map
        return aq_qp_map(np.asarray(y), self.ps.ctu_size, qp,
                         self.cfg.aq_strength)

    def _inter_qp_map(self, y, qp):
        """Per-CTB QP map for inter frames: AQ variance modulation and/or
        row-granular RC offsets (reference per-CTU RC QP analog,
        hmr_rc_calc_cu_qp hmr_rate_control.c:266-347; QG = CTB)."""
        if not self.ps.cu_qp_delta_enabled:
            return None
        ctu = self.ps.ctu_size
        rows = -(-self.cfg.height // ctu)
        cols = -(-self.cfg.width // ctu)
        base = None
        if self.cfg.aq_strength > 0:
            from homerhevc_tpu.engine.rate_control import aq_qp_map
            base = aq_qp_map(np.asarray(y), ctu, qp, self.cfg.aq_strength)
        if self.cfg.rc_ctu and self.rc.enabled:
            off = self.rc.row_offsets(rows)
            if base is None:
                base = np.full((rows, cols), qp, np.int32)
            base = np.clip(base + off[:, None], 0, 51).astype(np.int32)
        return base

    def _analyze_intra_golden(self, y, u, v, qp):
        from homerhevc_tpu.golden.intra_frame import encode_intra_frame
        qp_map = None
        if self.ps.cu_qp_delta_enabled and not (
                self.cfg.intra_rdo and self.ps.ctu_size >= 32):
            from homerhevc_tpu.engine.rate_control import aq_qp_map
            qp_map = aq_qp_map(np.asarray(y), self.ps.ctu_size, qp,
                               self.cfg.aq_strength)
        if self.cfg.intra_rdo and self.ps.ctu_size >= 32:
            from homerhevc_tpu.config import RDMode
            from homerhevc_tpu.golden.intra_tree import (
                decide_intra_tree, encode_intra_tree_frame)
            # RD_FULL adds NxN 4x4 PUs, TU splits and chroma-mode RDO
            # (golden-only; the device tree twin runs the fast decision)
            dec = decide_intra_tree(
                self.ps, y, u, v, qp, ctb=min(self.ps.ctu_size, 32),
                full_rd=self.cfg.rd_mode == RDMode.RD_FULL)
            desc, ry, ru, rv = encode_intra_tree_frame(
                self.ps, y, u, v, qp, dec, ctb=min(self.ps.ctu_size, 32))
        else:
            desc, ry, ru, rv = encode_intra_frame(
                self.ps, y, u, v, qp, cu_size=min(self.cfg.cu_size, 32),
                qp_map=qp_map)
        if self.ps.deblocking_enabled:
            from homerhevc_tpu.golden import deblock as gdb
            cu_sz = (self.ps.ctu_size >> desc.cu_depth).astype(np.int32)
            tu8 = (cu_sz >> desc.tr_depth).astype(np.int32)
            if self.ps.cu_qp_delta_enabled:
                # deblock with the DECODER's per-unit QP (uncoded QGs
                # inherit the predictor, not the AQ target)
                qp8 = gdb.decoder_qp_map8(desc, self.ps, qp,
                                          wpp=self.ps.wpp)
            else:
                qp8 = np.full_like(tu8, qp)
            bs_v, bs_h = gdb.intra_bs_maps(tu8)
            ry = gdb.deblock_plane_luma(ry, tu8, qp8, bs_v, bs_h)
            ru = gdb.deblock_plane_chroma(ru, qp8, bs_v, bs_h,
                                          self.ps.cb_qp_offset)
            rv = gdb.deblock_plane_chroma(rv, qp8, bs_v, bs_h,
                                          self.ps.cr_qp_offset)
        return desc, ry, ru, rv

    def _analyze_inter(self, y, u, v, qp=None, ref=None, is_b=False):
        """Inter frame analysis against a filtered reference picture."""
        qp = self.cfg.qp if qp is None else qp
        # device recon chain is valid even with SAO: the device program
        # decides and applies SAO in-loop (ops/sao_dev.py)
        chained = ref is None and self._last_recon_dev is not None
        ref = (self._last_recon_dev if chained
               else (self._last_recon if ref is None else ref))
        assert ref is not None
        if self._tpu_inter_ok():
            enc = self._get_tpu_inter()
            qp_map = None if is_b else self._inter_qp_map(y, qp)
            with PROFILER.scope("analyze_inter_device"):
                desc, ry, ru, rv = enc.encode_frame(
                    (y, u, v), ref, is_b=is_b, avg_dist=self.avg_dist,
                    qp=qp, qp_map=qp_map)
            # the recon stays resident on device; chain it for the next P
            # (only when this frame will be the reference and no host-side
            # filter (SAO) modifies the recon afterwards — _emit gates that)
            self._cand_recon_dev = enc.last_dev if not is_b else None
        else:
            self._cand_recon_dev = None
            from homerhevc_tpu.golden.inter_frame import (
                encode_inter_frame, encode_inter_frame_tree)
            qp_map = self._inter_qp_map(y, qp)
            if self.ps.ctu_size in (32, 64):
                desc, ry, ru, rv = encode_inter_frame_tree(
                    self.ps, (y, u, v), ref, qp, is_b=is_b,
                    search=self._inter_search_range(),
                    avg_dist=self.avg_dist, merge_rd=True, rect_pu=True,
                    qp_map=qp_map)
            else:
                desc, ry, ru, rv = encode_inter_frame(
                    self.ps, (y, u, v), ref, qp, cu_size=16, is_b=is_b,
                    search=self._inter_search_range(),
                    avg_dist=self.avg_dist, merge_rd=True, rect_pu=True,
                    qp_map=qp_map)
        # in-loop deblocking now runs inside both inter backends (device:
        # engine/inter_encoder deblock_inter; golden: _deblock_inter_luma);
        # chroma needs no pass in pure-inter frames (BS<2, spec 8.7.2.5.5)
        return desc, ry, ru, rv

    # ---- serialization ------------------------------------------------------

    def _serialize_slice_wpp(self, desc, slice_type: int, nal_type: int,
                             qp: int, sao_params=None, poc=None,
                             refs_before=(), refs_after=(),
                             l1_swap: bool = False) -> bytes:
        """WPP slice: one CABAC substream per CTU row; contexts fork from the
        state after the second CTB of the row above (spec entropy sync;
        reference ee_copy_entropy_model hmr_encoder_lib.c:2371). Rows are
        independent byte streams -> host-parallel entropy coding."""
        from homerhevc_tpu.hevc.bitstream import BitWriter, ebsp_row_escapes
        ps = self.ps
        st = {SLICE_I: "I", SLICE_P: "P"}.get(slice_type, "B")
        poc_val = self.gop_poc if poc is None else poc
        dists = _ref_dists(poc_val, refs_before, refs_after, l1_swap)
        num_ref_l0, rdl0 = _mref(desc, refs_before, poc_val)
        # native fast path (bails to python when the desc carries
        # per-CU ref_idx — multi-ref syntax is python-only for now)
        from homerhevc_tpu import native
        with PROFILER.scope("ser_native"):
            res = None if rdl0 is not None else native.encode_slice_native(
                ps, desc, init_contexts(st, qp), ps.sign_hiding,
                slice_type=slice_type, sao_params=sao_params, wpp=True,
                ref_dists=dists, slice_qp=qp)
        if res is not None:
            payload, row_sizes = res
            # exact per-CTU-row byte counts: the row-RC feedback consumes
            # these instead of the coefficient-mass proxy (reference
            # consumes real bits-so-far, hmr_rate_control.c:266-347)
            self._last_row_sizes = row_sizes
            # entry points count escaped bytes (spec 7.4.7.1; reference
            # count_needed_start_codes, hmr_headers.c:626)
            with PROFILER.scope("ser_escapes"):
                esc = ebsp_row_escapes(payload, row_sizes)
            offsets = [s + e for s, e in zip(row_sizes[:-1], esc[:-1])]
            sp = SliceParams(slice_type=slice_type, nal_type=nal_type,
                             poc=self.gop_poc if poc is None else poc, qp=qp,
                             sao_luma=sao_params is not None,
                             sao_chroma=sao_params is not None,
                             ref_pocs_before=refs_before,
                             ref_pocs_after=refs_after, l1_swap=l1_swap,
                             num_ref_l0=num_ref_l0)
            bw = write_slice_header(ps, sp, entry_point_offsets=offsets)
            return make_nal(nal_type, bw.get_bytes() + payload)
        rows = []
        saved_ctx = None      # ctx snapshot after CTB 1 of the previous row
        prev_saved = None
        for cy in range(ps.ctus_y):
            if cy == 0 or prev_saved is None:
                ctx = init_contexts(st, qp)
            else:
                ctx = prev_saved.copy()
            bw_row = BitWriter()
            enc = CabacEncoder(bw_row, ctx)
            sd = SliceDataEncoder(ps, desc, enc, slice_type, qp,
                                  sao_params=sao_params, ref_dists=dists,
                                  ref_dists_l0=rdl0)
            saved = None
            for cx in range(ps.ctus_x):
                sd.encode_ctu(cx, cy)
                last_ctu = (cy == ps.ctus_y - 1) and (cx == ps.ctus_x - 1)
                sd.encode_ctu_end(end_of_slice=last_ctu)
                if cx == 1:
                    saved = ctx.copy()
            if cy != ps.ctus_y - 1:
                enc.encode_terminate(1)  # end_of_subset_one_bit
            enc.finish()
            bw_row.write_byte_alignment()
            rows.append(bw_row.get_bytes())
            prev_saved = saved if saved is not None else prev_saved
        payload = b"".join(rows)
        self._last_row_sizes = [len(r) for r in rows]
        esc = ebsp_row_escapes(payload, [len(r) for r in rows])
        offsets = [len(r) + e for r, e in zip(rows[:-1], esc[:-1])]
        sp = SliceParams(slice_type=slice_type, nal_type=nal_type,
                         poc=self.gop_poc if poc is None else poc, qp=qp,
                         sao_luma=sao_params is not None,
                         sao_chroma=sao_params is not None,
                         ref_pocs_before=refs_before,
                         ref_pocs_after=refs_after, l1_swap=l1_swap,
                         num_ref_l0=num_ref_l0)
        bw = write_slice_header(ps, sp, entry_point_offsets=offsets)
        return make_nal(nal_type, bw.get_bytes() + payload)

    def _serialize_slice(self, desc, slice_type: int, nal_type: int,
                         qp: int, use_native: bool = True,
                         sao_params=None, poc=None,
                         refs_before=None, refs_after=(),
                         l1_swap: bool = False) -> bytes:
        ps = self.ps
        if refs_before is None:
            refs_before = ((self.gop_poc - 1,)
                           if slice_type != SLICE_I else ())
        if ps.wpp:
            return self._serialize_slice_wpp(desc, slice_type, nal_type, qp,
                                             sao_params=sao_params, poc=poc,
                                             refs_before=refs_before,
                                             refs_after=refs_after,
                                             l1_swap=l1_swap)
        poc_val = self.gop_poc if poc is None else poc
        num_ref_l0, rdl0 = _mref(desc, refs_before, poc_val)
        sp = SliceParams(slice_type=slice_type, nal_type=nal_type,
                         poc=poc_val, qp=qp,
                         sao_luma=sao_params is not None,
                         sao_chroma=sao_params is not None,
                         ref_pocs_before=refs_before,
                         ref_pocs_after=refs_after, l1_swap=l1_swap,
                         num_ref_l0=num_ref_l0)
        bw = write_slice_header(ps, sp)
        st = {SLICE_I: "I", SLICE_P: "P"}.get(slice_type, "B")
        ctx = init_contexts(st, qp)
        dists = _ref_dists(poc_val, refs_before, refs_after, l1_swap)
        if use_native and rdl0 is None:
            from homerhevc_tpu import native
            with PROFILER.scope("ser_native"):
                payload = native.encode_slice_native(
                    ps, desc, ctx, ps.sign_hiding, slice_type=slice_type,
                    sao_params=sao_params, ref_dists=dists, slice_qp=qp)
            if payload is not None:
                with PROFILER.scope("ser_nal"):
                    return make_nal(nal_type, bw.get_bytes() + payload)
        enc = CabacEncoder(bw, ctx)
        sd = SliceDataEncoder(ps, desc, enc, slice_type, qp,
                              sao_params=sao_params, ref_dists=dists,
                              ref_dists_l0=rdl0)
        n_ctus = ps.ctus_x * ps.ctus_y
        for i in range(n_ctus):
            sd.encode_ctu(i % ps.ctus_x, i // ps.ctus_x)
            sd.encode_ctu_end(end_of_slice=(i == n_ctus - 1))
        enc.finish()
        bw.write_byte_alignment()
        return make_nal(nal_type, bw.get_bytes())

    # ---- public flow ---------------------------------------------------------

    def _is_intra_poc(self, poc: int) -> bool:
        if self.cfg.gop_size == 0:
            return True
        if poc == 0:
            return True
        ip = self.cfg.intra_period
        return ip > 0 and poc % ip == 0

    def _emit(self, desc, ry, ru, rv, src=None, slice_type=SLICE_I, qp=None,
              poc=None, refs_before=None, refs_after=(), is_ref=True,
              display_poc=None, l1_swap=False):
        from homerhevc_tpu.api import EncodedFrame
        cfg = self.cfg
        qp = cfg.qp if qp is None else qp
        # device-decided SAO: recon arrived pre-filtered, host only writes
        # the syntax (ops/sao_dev.py)
        sao_params = getattr(desc, "sao_params", None)
        device_sao = sao_params is not None
        if self.ps.sao_enabled and not device_sao and src is not None:
            from homerhevc_tpu.hevc.sao import sao_apply_component, sao_decide
            with PROFILER.scope("sao"):
                ry, ru, rv = (np.asarray(ry), np.asarray(ru), np.asarray(rv))
                sao_params = sao_decide(src, (ry, ru, rv), self.ps.ctu_size,
                                        qp)
                ry = sao_apply_component(ry, sao_params, 0, self.ps.ctu_size)
                ru = sao_apply_component(ru, sao_params, 1,
                                         self.ps.ctu_size // 2)
                rv = sao_apply_component(rv, sao_params, 2,
                                         self.ps.ctu_size // 2)
        nals = []
        if slice_type == SLICE_I:
            self.gop_poc = 0
            nal_type = NAL_IDR_W_RADL
            nals.append(write_vps(self.ps))
            nals.append(write_sps(self.ps))
            nals.append(write_pps(self.ps))
        elif is_ref:
            nal_type = NAL_TRAIL_R
        else:
            nal_type = NAL_TRAIL_N
        with PROFILER.scope("serialize"):
            nals.append(self._serialize_slice(desc, slice_type, nal_type, qp,
                                              sao_params=sao_params, poc=poc,
                                              refs_before=refs_before,
                                              refs_after=refs_after,
                                              l1_swap=l1_swap))
        if is_ref and self.cfg.gop_size != 0:
            # stored as-is (device arrays stay device-resident); consumers
            # (golden backends, scene change, gop2) coerce via np.asarray.
            # _prev_recon2 = t-2 reference for generalized-B; never valid
            # across an IDR (refs must stay inside the coded video sequence)
            self._prev_recon2 = (None if slice_type == SLICE_I
                                 else self._last_recon)
            self._last_recon = (ry, ru, rv)
            # multi-reference pool (most recent first; refs never cross an
            # IDR — reference ref_wnds analog, hmr_private.h:1407)
            q = [] if slice_type == SLICE_I \
                else getattr(self, "_ref_queue", [])
            self._ref_queue = ([(ry, ru, rv)] + q)[
                :max(1, self.cfg.num_ref_frames)]
            cand = getattr(self, "_cand_recon_dev", None)
            if sao_params is not None and not device_sao:
                self._last_recon_dev = None   # host filter modified the recon
            elif cand is not None:
                self._last_recon_dev = cand
            # else: keep any chain set at dispatch time (pipelined P path)
            self._cand_recon_dev = None
        if src is not None and self.cfg.gop_size != 0:
            # average luma distortion per 4x4 partition, feeding the adaptive
            # inter zero-forcing threshold (reference avg_dist,
            # hmr_encoder_lib.c:3215-3233: x1.5 after I frames). Exact int
            # SSD: the device engines ship per-row sums (desc.row_ssd_y) so
            # recon never crosses the link for this; the host fallback
            # computes the identical integer.
            rs = getattr(desc, "row_ssd_y", None)
            if rs is not None and (sao_params is None or device_sao):
                ssd = int(np.asarray(rs, np.int64).sum())
            else:
                d = (np.asarray(ry, np.int64)
                     - np.asarray(src[0], np.int64)).ravel()
                ssd = int(np.dot(d, d))
            avg = float(ssd) / (np.asarray(src[0]).size / 16.0)
            self.avg_dist = avg * (1.5 if slice_type == SLICE_I else 1.0)
        if self.cfg.rc_ctu and self.rc.enabled and slice_type != SLICE_I:
            rs = getattr(self, "_last_row_sizes", None) if self.ps.wpp \
                else None
            if rs is not None:
                # WPP: the serializer's exact per-CTU-row byte counts (the
                # reference consumes real bits-so-far, hmr_rate_control.c:
                # 266-347); no coefficient densification needed
                self.rc.note_row_shares(np.asarray(rs, np.float64) + 1)
            elif desc.coef_y is not None or desc.cg_wire is not None:
                # per-CTB-row coded-mass proxy (bits ~ 3*nnz + sum|lvl| —
                # the device cost model's arithmetic)
                d = desc.densify()
                ctu = self.ps.ctu_size
                rows = -(-self.cfg.height // ctu)

                def row_mass(plane, unit):
                    p = np.abs(plane.astype(np.int64))
                    pad = rows * unit - p.shape[0]
                    if pad > 0:
                        p = np.pad(p, ((0, pad), (0, 0)))
                    return (p + 2 * (p != 0)).reshape(rows, -1).sum(axis=1)
                mass = (row_mass(d.coef_y, ctu)
                        + row_mass(d.coef_u, ctu // 2)
                        + row_mass(d.coef_v, ctu // 2))
                self.rc.note_row_shares(mass + 1)
        ftype = {SLICE_I: "I", SLICE_P: "P"}.get(slice_type, "B")
        oh, ow = self.out_h, self.out_w

        def recon_thunk(ry=ry, ru=ru, rv=rv):
            return {"y": np.asarray(ry, np.uint8)[:oh, :ow],
                    "u": np.asarray(ru, np.uint8)[:oh // 2, :ow // 2],
                    "v": np.asarray(rv, np.uint8)[:oh // 2, :ow // 2]}
        ef = EncodedFrame(self.poc if display_poc is None else display_poc,
                          ftype, nals, recon=recon_thunk, avg_qp=qp)
        self.rc.end_pic(ef.bits, slice_type == SLICE_I)
        self.poc += 1
        self.gop_poc += 1
        return ef

    def _drain_queue(self, final: bool = False) -> Iterator:
        """Dispatch the queued batch to the device, then serialize the
        PREVIOUS batch while the device runs (host/device overlap — the
        analog of the reference's engine pipelining)."""
        frames = self._queue
        self._queue = []
        if frames and len(frames) > 1 and self._tpu_ok():
            # depth-2 batch pipeline: two batches stay in flight so the
            # link never idles between the upload / execute / download
            # phases (the single-chip analog of the reference's multiple
            # encoder engines, hmr_encoder_lib.c:1646)
            enc = self._get_tpu()
            # start this batch's (large) source upload first: device_put
            # returns quickly while the 33 MB copy streams over the link,
            # hiding under this drain's fetch + serialization. (A deeper
            # upload-ahead pipeline was tried and measured SLOWER — the
            # tunnel client throttles with too many outstanding transfers.)
            with PROFILER.scope("pack_upload"):
                self._upload_q.append((enc.pack_upload(frames), frames))
            yield from self._dispatch_upload(enc)
        else:
            # in-order output: finish uploaded + in-flight device batches
            # before any inline-analyzed frame is emitted
            while self._upload_q:
                yield from self._dispatch_upload(self._get_tpu())
            yield from self._drain_fetch_inflight()
            while self._pending_q:
                yield from self._fetch_emit(self._pending_q.pop(0))
            for fr in frames:
                if self.cfg.num_b >= 1:
                    yield from self._encode_gop2(fr, final=False)
                    continue
                y, u, v = fr
                intra = self._is_intra_poc(self.poc)
                qp = self.rc.pic_qp(intra)
                # record the source for EVERY frame (including scheduled
                # intras) so the MAD stays a one-frame delta; the first P
                # after a periodic I must not compare sources two frames
                # apart
                scene_cut = self._scene_change(y)
                if (not intra and self.cfg.reinit_gop_on_scene_change
                        and scene_cut):
                    # reference behaviour: scene change -> RC pivot + GOP
                    # reinit (hmr_motion_inter.c:3791, reinit_gop flag;
                    # RC pivot hmr_rc_change_pic_mode,
                    # hmr_rate_control.c:49-87): the injected IDR takes
                    # the I-frame QP/budget and stale P-cost stats reset
                    intra = True
                    self.rc.scene_pivot()
                    qp = self.rc.pic_qp(True)
                if intra:
                    yield from self._drain_p_pending()
                    desc, ry, ru, rv = self._analyze_intra(y, u, v, qp)
                    yield self._emit(desc, ry, ru, rv, src=(y, u, v), qp=qp)
                elif (self.cfg.num_ref_frames > 2
                      and len(getattr(self, "_ref_queue", ())) >= 2):
                    # multi-reference L0 (N > 2): per-CU ref choice +
                    # ref_idx_l0 coding on the golden path (the 2-ref case
                    # rides the device two-list GPB machinery instead)
                    yield from self._drain_p_pending()
                    nref = min(self.cfg.num_ref_frames,
                               len(self._ref_queue))
                    refs = [tuple(np.asarray(pl, np.int32) for pl in r)
                            for r in self._ref_queue[:nref]]
                    from homerhevc_tpu.golden.inter_frame import \
                        encode_inter_frame
                    dists = tuple(i + 1 for i in range(nref))
                    self._cand_recon_dev = None
                    self._last_recon_dev = None
                    with PROFILER.scope("analyze_inter_mref"):
                        desc, ry, ru, rv = encode_inter_frame(
                            self.ps, (y, u, v), refs[0], qp, cu_size=16,
                            search=self._inter_search_range(),
                            avg_dist=self.avg_dist, ref_list=refs,
                            ref_dists=dists)
                    pnow = self.gop_poc
                    yield self._emit(
                        desc, ry, ru, rv, src=(y, u, v),
                        slice_type=SLICE_P, qp=qp,
                        refs_before=tuple(pnow - d for d in dists))
                elif self._p_pipeline_ok():
                    # P-chain software pipeline: dispatch frame i on device
                    # (its ME reads the device-resident recon of frame i-1),
                    # then do frame i-1's host half (downloads, syntax
                    # selection, CABAC) while the device runs — the frame
                    # engine overlap of the reference (encoder_engine_thread)
                    # done as device/host overlap on one chip. Depth 2: two
                    # frames stay in flight so the device keeps computing
                    # while the host serializes (the avg_dist zero-forcing
                    # feedback then lags 2 frames, like the reference's
                    # cross-engine RC handoff, hmr_encoder_lib.c:3268).
                    # Generalized-B: once two references exist, the frame
                    # bi-predicts from t-1 and t-2 (cfg.gpb).
                    enc = self._get_tpu_inter()
                    chain_active = self._last_recon_dev is not None
                    ref = (self._last_recon_dev if chain_active
                           else self._last_recon)
                    ref2 = getattr(self, "_last_recon_dev2", None)
                    if ref2 is None and chain_active:
                        # host fallback for the t-2 reference: when emits
                        # lag dispatch (>=1 frame still in flight),
                        # _last_recon is the recon of t-2; when emits have
                        # caught up, it is t-1 and _prev_recon2 holds t-2
                        if self._p_pendings:
                            ref2 = self._last_recon
                        else:
                            ref2 = getattr(self, "_prev_recon2", None)
                    # generalized-B "P" frames: explicit cfg.gpb, or
                    # num_ref_frames >= 2 (multi-reference realized as the
                    # two-list t-1/t-2 machinery; reference analog
                    # ref_wnds[] multi-ref, hmr_private.h:1407)
                    want_gpb = self.cfg.gpb or self.cfg.num_ref_frames >= 2
                    gpb = (want_gpb and ref2 is not None
                           and self.ps.ctu_size == 32)
                    with PROFILER.scope("dispatch_inter"):
                        if gpb:
                            out = enc.dispatch_b((y, u, v), ref, ref2,
                                                 self.avg_dist, qp=qp)
                        else:
                            out = enc.dispatch((y, u, v), ref,
                                               self.avg_dist, qp=qp)
                    self._last_recon_dev2 = (
                        self._last_recon_dev if self._last_recon_dev
                        is not None else None)
                    self._last_recon_dev = enc.last_dev
                    self._cand_recon_dev = None
                    self._p_pendings.append((enc, out, (y, u, v), qp, gpb))
                    if len(self._p_pendings) >= 2:
                        yield from self._drain_p_pending(one=True)
                else:
                    yield from self._drain_p_pending()
                    desc, ry, ru, rv = self._analyze_inter(y, u, v, qp)
                    yield self._emit(desc, ry, ru, rv, src=(y, u, v),
                                     slice_type=SLICE_P, qp=qp)
        if final:
            yield from self._drain_p_pending()
        if final and self.cfg.num_b >= 1:
            yield from self._encode_gop2(None, final=True)
        if final:
            while self._upload_q:
                yield from self._dispatch_upload(self._get_tpu())
            yield from self._drain_fetch_inflight()
            while self._pending_q:
                yield from self._fetch_emit(self._pending_q.pop(0))

    def _dispatch_upload(self, enc) -> Iterator:
        """Dispatch the oldest uploaded batch; serialize the batch whose
        background fetch was started last cycle (device/host overlap:
        the fetch thread's link transfers + native unpack run while the
        main thread does C++ CABAC for the previous batch)."""
        handle, frames = self._upload_q.pop(0)
        prev_results = None
        if self._fetch_inflight is not None:
            with PROFILER.scope("fetch_join"):
                prev_results = self._fetch_inflight.join()
            self._fetch_inflight = None
        qp = self.rc.pic_qp(True)
        maps = None
        if self.ps.cu_qp_delta_enabled and not self._tpu_tree_ok():
            maps = [self._aq_map(fr[0], qp) for fr in frames]
        with PROFILER.scope("dispatch_intra"):
            self._pending_q.append(
                (enc.dispatch_packed(handle, [qp] * len(frames),
                                     qp_maps=maps),
                 frames, qp, maps))
        # depth 2 + background fetch: deeper pipelines measured SLOWER —
        # the tunnel client throttles with too many outstanding transfers
        # (device_put blocked ~750 ms/batch at depth 3)
        if len(self._pending_q) >= 2:
            out, pframes, pqp, pmaps = self._pending_q.pop(0)
            self._fetch_inflight = _AsyncFetch(enc, out, pframes, pqp,
                                               qp_maps=pmaps)
        if prev_results is not None:
            results, pframes, pqp = prev_results
            for (desc, ry, ru, rv), src in zip(results, pframes):
                yield self._emit(desc, ry, ru, rv, src=src, qp=pqp)

    def _fetch_emit(self, pending) -> Iterator:
        out, pframes, qp, pmaps = pending
        with PROFILER.scope("fetch_intra"):
            results = self._get_tpu().fetch_frames(out, len(pframes),
                                                   qp_maps=pmaps)
        for (desc, ry, ru, rv), src in zip(results, pframes):
            yield self._emit(desc, ry, ru, rv, src=src, qp=qp)

    def _drain_fetch_inflight(self) -> Iterator:
        if self._fetch_inflight is not None:
            results, pframes, pqp = self._fetch_inflight.join()
            self._fetch_inflight = None
            for (desc, ry, ru, rv), src in zip(results, pframes):
                yield self._emit(desc, ry, ru, rv, src=src, qp=pqp)

    def _encode_gop2(self, frame, final: bool) -> Iterator:
        """IBP GOP (gop_size 2, 1 B frame): anchors at even display
        positions, B between them, emitted in decode order I0 P2 B1 P4 B3...
        B frames predict from the previous anchor (L0-uni this round) and
        carry both anchors in their RPS."""
        if not hasattr(self, "_disp"):
            self._disp = 0
            self._held = None
            self._idr_base = 0

        def emit_anchor(t, fr):
            intra = t == 0 or (self.cfg.intra_period > 0
                               and (t - self._idr_base) % self.cfg.intra_period == 0)
            qp = self.rc.pic_qp(intra)
            if intra and self._held is not None:
                # closed GOP: the held frame becomes a trailing P before IDR
                bt, fb = self._held
                self._held = None
                qb = self.rc.pic_qp(False)
                d2, r2y, r2u, r2v = self._analyze_inter(*fb, qp=qb)
                yield self._emit(d2, r2y, r2u, r2v, src=fb,
                                 slice_type=SLICE_P, qp=qb,
                                 poc=bt - self._idr_base, display_poc=bt,
                                 refs_before=(bt - 1 - self._idr_base,))
            if intra:
                self._idr_base = t
                desc, ry, ru, rv = self._analyze_intra(*fr, qp=qp)
                self._anchor_m2 = None
                yield self._emit(desc, ry, ru, rv, src=fr, qp=qp,
                                 display_poc=t)
            else:
                poc = t - self._idr_base
                anchor_dist = 2 if self._held is not None else 1
                prev2 = getattr(self, "_anchor_m2", None)
                bi_anchor = (anchor_dist == 2 and prev2 is not None
                             and self._tpu_inter_ok()
                             and self.ps.ctu_size == 32
                             and self.cfg.width % 32 == 0
                             and self.cfg.height % 32 == 0)
                if bi_anchor:
                    # generalized-B anchor: bi-predict from the two
                    # previous anchors (t-2 = L0, t-4 = L1 via l1_swap);
                    # per-CU uni/bi keeps quality at asymmetric distances
                    enc = self._get_tpu_inter()
                    with PROFILER.scope("analyze_anchor_bi"):
                        desc, ry, ru, rv = enc.encode_frame_b(
                            fr, self._last_recon, prev2,
                            avg_dist=self.avg_dist, qp=qp,
                            ref_dists=(2, 4))
                    # this anchor IS the next reference: chain its
                    # device-resident recon (a stale _cand_recon_dev from
                    # an earlier _analyze_inter would silently become the
                    # next frame's reference otherwise)
                    self._cand_recon_dev = enc.last_dev
                    self._anchor_m2 = self._last_recon
                    yield self._emit(desc, ry, ru, rv, src=fr,
                                     slice_type=SLICE_B, qp=qp, poc=poc,
                                     display_poc=t,
                                     refs_before=(poc - 2, poc - 4),
                                     l1_swap=True)
                else:
                    self._anchor_m2 = (self._last_recon
                                       if anchor_dist == 2 else None)
                    desc, ry, ru, rv = self._analyze_inter(*fr, qp=qp)
                    yield self._emit(desc, ry, ru, rv, src=fr,
                                     slice_type=SLICE_P, qp=qp, poc=poc,
                                     display_poc=t,
                                     refs_before=(poc - 2,)
                                     if self._held is not None
                                     else (poc - 1,))
            # after the anchor is reconstructed, encode the held B:
            # bi-prediction from BOTH anchors (14-bit weighted average,
            # golden encode_b_frame_tree) when the tree geometry allows,
            # else L0-uni fallback
            if self._held is not None:
                bt, fb = self._held
                self._held = None
                bpoc = bt - self._idr_base
                # non-reference B: QP ladder step (cfg.b_qp_offset) — the
                # reference's depth-scaled lambda (hmr_tables.c:315-374)
                qb = min(51, self.rc.pic_qp(False) + self.cfg.b_qp_offset)
                if (prev_anchor_recon is not None
                        and self.ps.ctu_size == 32
                        and self.cfg.width % 32 == 0
                        and self.cfg.height % 32 == 0):
                    if self._tpu_inter_ok():
                        enc = self._get_tpu_inter()
                        with PROFILER.scope("analyze_b_bi"):
                            d2, r2y, r2u, r2v = enc.encode_frame_b(
                                fb, prev_anchor_recon, self._last_recon,
                                avg_dist=self.avg_dist, qp=qb)
                    else:
                        from homerhevc_tpu.golden.inter_frame import \
                            encode_b_frame_tree
                        with PROFILER.scope("analyze_b_bi"):
                            d2, r2y, r2u, r2v = encode_b_frame_tree(
                                self.ps, fb,
                                tuple(np.asarray(p, np.int32)
                                      for p in prev_anchor_recon),
                                tuple(np.asarray(p, np.int32)
                                      for p in self._last_recon),
                                qb, search=self._inter_search_range(),
                                avg_dist=self.avg_dist)
                else:
                    d2, r2y, r2u, r2v = self._analyze_inter(
                        *fb, qp=qb, ref=prev_anchor_recon, is_b=True)
                yield self._emit(d2, r2y, r2u, r2v, src=fb,
                                 slice_type=SLICE_B, qp=qb, poc=bpoc,
                                 display_poc=bt,
                                 refs_before=(bpoc - 1,),
                                 refs_after=(bpoc + 1,), is_ref=False)

        if frame is not None:
            t = self._disp
            self._disp += 1
            if t % 2 == 1 and not (
                    self.cfg.intra_period > 0
                    and (t - self._idr_base) % self.cfg.intra_period == 0):
                self._held = (t, frame)
                return
            prev_anchor_recon = self._last_recon
            yield from emit_anchor(t, frame)
        elif final and self._held is not None:
            bt, fb = self._held
            self._held = None
            qb = self.rc.pic_qp(False)
            d2, r2y, r2u, r2v = self._analyze_inter(*fb, qp=qb)
            yield self._emit(d2, r2y, r2u, r2v, src=fb, slice_type=SLICE_P,
                             qp=qb, poc=bt - self._idr_base, display_poc=bt,
                             refs_before=(bt - 1 - self._idr_base,))

    def _scene_change(self, y: np.ndarray) -> bool:
        """Scene-change detector: mean absolute difference between
        consecutive SOURCE lumas against an ADAPTIVE threshold. The
        reference counts intra-chosen partitions (>70%%,
        hmr_motion_inter.c:3791) — a content-relative signal; this
        build's pre-ME analog tracks the running MAD level (EMA) and its
        deviation, cutting when the current MAD spikes far above the
        clip's own motion level (fast pans on noisy content no longer
        trip a fixed constant; static content still cuts on hard
        transitions). Source frames (not recon) keep the detector
        independent of the device-resident reference chain, so the P
        software pipeline stays enabled with detection on."""
        prev = getattr(self, "_last_src_y", None)
        self._last_src_y = np.asarray(y, np.int16)
        if prev is None:
            return False
        mad = float(np.mean(np.abs(self._last_src_y.astype(np.int32)
                                   - prev)))
        ema = getattr(self, "_mad_ema", None)
        if ema is None:
            # first delta seeds the running level; a cut on frame 1 is
            # still caught by the absolute floor below
            self._mad_ema, self._mad_dev = mad, max(2.0, mad * 0.25)
            return mad > 30.0
        dev = self._mad_dev
        thresh = max(12.0, ema + 5.0 * dev)
        cut = mad > thresh
        if not cut:
            self._mad_ema = 0.8 * ema + 0.2 * mad
            self._mad_dev = 0.8 * dev + 0.2 * abs(mad - self._mad_ema)
        return cut

    def _tpu_tree_ok(self) -> bool:
        """Device intra CU-tree path (decide + CTB32 wavefront encode +
        in-loop BS-map deblock)."""
        from homerhevc_tpu.config import RDMode
        return (self.backend in ("auto", "tpu") and self.cfg.intra_rdo
                and self.cfg.cu_size in (32, 64)
                and not self.ps.cu_qp_delta_enabled
                and self.cfg.rd_mode != RDMode.RD_FULL
                and self.cfg.width % 32 == 0 and self.cfg.height % 32 == 0)

    def _tpu_ok(self) -> bool:
        if self._tpu_tree_ok():
            return True
        # per-CTB AQ runs on the CU16 device path (per-block QP vectors in
        # quant; _encode_frame_impl_aq) as long as deblocking is off — the
        # decoder's deblock QP needs the effective-QP inference, which the
        # host golden path provides
        return (self.backend in ("auto", "tpu")
                and not self.cfg.intra_rdo
                and not (self.ps.cu_qp_delta_enabled
                         and self.ps.deblocking_enabled)
                and self.cfg.cu_size == 16
                and self.cfg.width % 16 == 0 and self.cfg.height % 16 == 0)

    def _inter_search_range(self) -> int:
        # IBP anchors are two display frames apart: double the exhaustive
        # window so anchor ME covers the same velocity as the IPPP chain
        # (the reference's diamond search roams +-128/64 instead)
        return 24 if self.cfg.num_b >= 1 else 16

    def _get_tpu_inter(self):
        if self._tpu_inter is None:
            from homerhevc_tpu.engine.inter_encoder import TpuInterEncoder
            self._tpu_inter = TpuInterEncoder(
                self.ps, self.cfg, search=self._inter_search_range())
        return self._tpu_inter

    def _p_pipeline_ok(self) -> bool:
        """The P-chain device/host overlap needs the device inter backend.
        QP is a traced device input, so CBR/VBR run pipelined too: the RC
        QP for frame i is computed from bits known at dispatch time, i.e.
        the feedback lags by the in-flight depth (2 frames) — the same lag
        the reference accepts across engines (hmr_encoder_lib.c:3268).
        SAO is compatible: the device program decides and applies it
        in-loop (ops/sao_dev.py). Scene-change detection is compatible:
        it reads only consecutive source frames. Per-CTB QP maps run on
        the inline path only (the map rides dispatch; row-RC feedback
        needs emits in step with analysis)."""
        return self._tpu_inter_ok() and not self.ps.cu_qp_delta_enabled

    def _drain_p_pending(self, one: bool = False):
        while self._p_pendings:
            enc, out, src, qp, gpb = self._p_pendings.pop(0)
            with PROFILER.scope("fetch_inter"):
                desc, ry, ru, rv = enc.fetch(out, bi=gpb, ref_dists=(1, 2))
            if gpb:
                p = self.gop_poc
                yield self._emit(desc, ry, ru, rv, src=src,
                                 slice_type=SLICE_B, qp=qp,
                                 refs_before=(p - 1, p - 2), l1_swap=True)
            else:
                yield self._emit(desc, ry, ru, rv, src=src,
                                 slice_type=SLICE_P, qp=qp)
            if one:
                return

    def _tpu_inter_ok(self) -> bool:
        # the inter engine also supports the CTB32 two-level CU tree.
        # per-CTB QP maps (AQ / row-RC) ride per-block QP vectors in the
        # quant tier; deblock+AQ needs the host decoder-view QP inference
        # and intra-in-P is excluded with maps (golden twin parity)
        if self._tpu_ok():
            return True
        aq_ok = (not self.ps.cu_qp_delta_enabled
                 or (not self.ps.deblocking_enabled
                     and not self.cfg.intra_in_p))
        geom_ok = ((self.cfg.cu_size == 32 and self.cfg.width % 32 == 0
                    and self.cfg.height % 16 == 0)
                   or (self.cfg.cu_size == 64 and self.cfg.width % 64 == 0
                       and self.cfg.height % 64 == 0))
        return self.backend in ("auto", "tpu") and aq_ok and geom_ok

    def _get_tpu(self):
        if self._tpu_intra is None:
            if self._tpu_tree_ok():
                from homerhevc_tpu.engine.intra_tree_encoder import \
                    TpuIntraTreeEncoder
                self._tpu_intra = TpuIntraTreeEncoder(self.ps, self.cfg)
            else:
                from homerhevc_tpu.engine.intra_encoder import TpuIntraEncoder
                self._tpu_intra = TpuIntraEncoder(self.ps, self.cfg)
        return self._tpu_intra

    def _pad_frame(self, y, u, v):
        dh = self.cfg.height - np.asarray(y).shape[0]
        dw = self.cfg.width - np.asarray(y).shape[1]
        if dh == 0 and dw == 0:
            return y, u, v
        assert dh >= 0 and dw >= 0, "input larger than configured size"
        y = np.pad(np.asarray(y), ((0, dh), (0, dw)), mode="edge")
        u = np.pad(np.asarray(u), ((0, dh // 2), (0, dw // 2)), mode="edge")
        v = np.pad(np.asarray(v), ((0, dh // 2), (0, dw // 2)), mode="edge")
        return y, u, v

    def push(self, y: np.ndarray, u: np.ndarray, v: np.ndarray) -> Iterator:
        fr = self._pad_frame(y, u, v)
        self._queue.append(fr)
        if len(self._queue) >= self.batch:
            yield from self._drain_queue()

    def flush(self) -> Iterator:
        yield from self._drain_queue(final=True)
