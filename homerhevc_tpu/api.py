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

    def encode_sequence(self, frames) -> list[EncodedFrame]:
        out = []
        for (y, u, v) in frames:
            out.extend(self.encode(y, u, v))
        out.extend(self.flush())
        return out
