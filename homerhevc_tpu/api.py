"""Public encoder API — the TPU-native analog of the 6-entry HOMER API
(reference: homer_hevc_enc_api.h:169-174: HOMER_enc_init / close / encode /
get_coded_frame / write_annex_b_output / enc_control).

Python-idiomatic surface: an Encoder object with encode()/flush();
Annex-B assembly is a function of the returned NAL lists.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from homerhevc_tpu.config import EncoderConfig
from homerhevc_tpu.hevc.bitstream import annex_b


class EncodedFrame:
    """Output unit: NAL payloads + reconstruction (analog of output_set_t).

    `recon` may be passed as a zero-arg callable; it is then materialized
    on first access. The device pipeline uses this to keep reconstruction
    planes device-resident unless a consumer (recon dump, PSNR, tests)
    actually reads them — the host link is the throughput bottleneck."""

    def __init__(self, poc: int, frame_type: str, nals: list[bytes],
                 recon=None, avg_qp: float = 0.0):
        self.poc = poc
        self.frame_type = frame_type
        self.nals = nals
        self._recon = recon  # {'y','u','v'} uint8 planes, or thunk
        self.avg_qp = avg_qp

    @property
    def recon(self) -> Optional[dict]:
        if callable(self._recon):
            self._recon = self._recon()
        return self._recon

    @property
    def bits(self) -> int:
        return sum(len(n) + 4 for n in self.nals) * 8

    def annex_b(self) -> bytes:
        return annex_b(self.nals)


class Encoder:
    """Session object owning config, GOP state, reference pool and the
    device pipeline. Equivalent of hvenc_enc_t (hmr_private.h:1370)."""

    def __init__(self, cfg: EncoderConfig):
        self.cfg = cfg
        from homerhevc_tpu.engine.pipeline import EncoderPipeline
        self._pipeline = EncoderPipeline(cfg)

    def encode(self, y: np.ndarray, u: np.ndarray, v: np.ndarray) -> Iterator[EncodedFrame]:
        """Submit one YUV420 8-bit frame; yields finished frames (possibly
        none yet if the pipeline is filling)."""
        yield from self._pipeline.push(y, u, v)

    def flush(self) -> Iterator[EncodedFrame]:
        """Drain the pipeline (analog of HOMER_enc_control(HOMER_END))."""
        yield from self._pipeline.flush()

    # config fields whose change does NOT invalidate the compiled device
    # programs (QP and the source planes are traced inputs; these knobs
    # live in host GOP/RC logic only)
    _SOFT_FIELDS = frozenset({
        "qp", "bitrate_kbps", "bitrate_mode", "frame_rate", "vbv_size",
        "vbv_init", "intra_period", "gop_size", "num_b", "b_qp_offset",
        "reinit_gop_on_scene_change",
    })

    def reconfigure(self, **changes) -> list[EncodedFrame]:
        """Mid-stream reconfiguration (analog of HOMER_enc_control re-SETCFG,
        hmr_encoder_lib.c:727-738: the reference tears the engines down and
        rebuilds them). The in-flight GOP is drained first (returned to the
        caller), then the pipeline restarts with the updated config — the
        next coded frame is an IDR with fresh VPS/SPS/PPS, so a decoder can
        join at the switch point. Compiled device encoder objects are kept
        when every changed field is RC/GOP-side (bitrate, QP, frame rate,
        GOP shape): geometry- or tool-changing edits recompile, exactly as
        a resolution change would on the reference."""
        import dataclasses
        drained = list(self.flush())
        unknown = [k for k in changes
                   if not hasattr(self.cfg, k)]
        if unknown:
            raise ValueError(f"unknown config fields: {unknown}")
        old = self._pipeline
        self.cfg = dataclasses.replace(self.cfg, **changes)
        from homerhevc_tpu.engine.pipeline import EncoderPipeline
        self._pipeline = EncoderPipeline(self.cfg)
        if all(k in self._SOFT_FIELDS for k in changes):
            for k in ("_tpu_intra", "_tpu_inter"):
                if getattr(old, k, None) is not None:
                    setattr(self._pipeline, k, getattr(old, k))
        return drained

    def encode_sequence(self, frames) -> list[EncodedFrame]:
        out = []
        for (y, u, v) in frames:
            out.extend(self.encode(y, u, v))
        out.extend(self.flush())
        return out
