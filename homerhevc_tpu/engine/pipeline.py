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

from homerhevc_tpu.config import BitrateMode, EncoderConfig
from homerhevc_tpu.hevc.bitstream import (
    NAL_IDR_W_RADL, NAL_TRAIL_R, make_nal,
)
from homerhevc_tpu.hevc.cabac import CabacEncoder
from homerhevc_tpu.hevc.ctx_tables import init_contexts
from homerhevc_tpu.hevc.headers import (
    SLICE_I, SLICE_P, ParamSets, SliceParams, write_pps, write_slice_header,
    write_sps, write_vps,
)
from homerhevc_tpu.hevc.syntax import SliceDataEncoder


class EncoderPipeline:
    def __init__(self, cfg: EncoderConfig, backend: str = "auto"):
        self.cfg = cfg
        self.ps = ParamSets.from_config(cfg)
        self.poc = 0
        self.backend = backend
        self._tpu_encoder = None

    # ---- frame analysis dispatch ------------------------------------------

    def _analyze_intra(self, y: np.ndarray, u: np.ndarray, v: np.ndarray):
        backend = self.backend
        if backend == "auto":
            # device wavefront v1 requires raster coding order (CTB == CU == 16)
            # and dims divisible by 16; otherwise use the golden path
            ok = (self.cfg.cu_size == 16
                  and self.cfg.width % 16 == 0 and self.cfg.height % 16 == 0)
            backend = "tpu" if ok else "golden"
        if backend == "golden":
            from homerhevc_tpu.golden.intra_frame import encode_intra_frame
            return encode_intra_frame(self.ps, y, u, v, self.cfg.qp,
                                      cu_size=min(self.cfg.cu_size, 32))
        from homerhevc_tpu.engine.intra_encoder import TpuIntraEncoder
        if self._tpu_encoder is None:
            self._tpu_encoder = TpuIntraEncoder(self.ps, self.cfg)
        return self._tpu_encoder.encode_frame(y, u, v, self.cfg.qp)

    # ---- serialization ------------------------------------------------------

    def _serialize_slice(self, desc, slice_type: int, nal_type: int,
                         qp: int) -> bytes:
        ps = self.ps
        sp = SliceParams(slice_type=slice_type, nal_type=nal_type,
                         poc=self.poc, qp=qp)
        bw = write_slice_header(ps, sp)
        st = {SLICE_I: "I", SLICE_P: "P"}.get(slice_type, "B")
        ctx = init_contexts(st, qp)
        enc = CabacEncoder(bw, ctx)
        sd = SliceDataEncoder(ps, desc, enc, slice_type, qp)
        n_ctus = ps.ctus_x * ps.ctus_y
        for i in range(n_ctus):
            sd.encode_ctu(i % ps.ctus_x, i // ps.ctus_x)
            sd.encode_ctu_end(end_of_slice=(i == n_ctus - 1))
        enc.finish()
        bw.write_byte_alignment()
        return make_nal(nal_type, bw.get_bytes())

    # ---- public flow ---------------------------------------------------------

    def push(self, y: np.ndarray, u: np.ndarray, v: np.ndarray) -> Iterator:
        from homerhevc_tpu.api import EncodedFrame
        cfg = self.cfg
        desc, ry, ru, rv = self._analyze_intra(y, u, v)
        nals = []
        is_idr = self.poc == 0 or (
            cfg.intra_period > 0 and self.poc % cfg.intra_period == 0)
        # all-intra path for now: every frame IDR-coded
        nal_type = NAL_IDR_W_RADL
        if is_idr or cfg.gop_size == 0:
            nals.append(write_vps(self.ps))
            nals.append(write_sps(self.ps))
            nals.append(write_pps(self.ps))
        nals.append(self._serialize_slice(desc, SLICE_I, nal_type, cfg.qp))
        ef = EncodedFrame(self.poc, "I", nals,
                          recon={"y": ry.astype(np.uint8),
                                 "u": ru.astype(np.uint8),
                                 "v": rv.astype(np.uint8)})
        self.poc += 1
        yield ef

    def flush(self) -> Iterator:
        return iter(())
