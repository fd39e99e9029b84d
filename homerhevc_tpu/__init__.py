"""homerhevc_tpu — a TPU-native HEVC/H.265 encoder framework.

A ground-up re-design of the capabilities of HomerHEVC (reference:
/root/reference, see SURVEY.md) for TPU hardware:

- Analysis / reconstruction math (intra prediction, integer DCT/DST,
  quantization, motion search, interpolation, deblocking, SAO) runs as
  batched JAX/XLA/Pallas programs over CTU tensors on device.
- The intrinsically sequential entropy tier (CABAC bin coding, bitstream
  packing, headers) runs on host: a pure-Python reference implementation
  plus a C++ production path (ctypes).
- Parallelism: wavefront diagonals are batched on-device (replacing the
  reference's WPP pthread ring, hmr_encoder_lib.c:2849), frames/streams
  shard over a jax.sharding.Mesh (replacing "encoder engines",
  hmr_encoder_lib.c:3132).

Public API mirrors the 6-entry HOMER API (homer_hevc_enc_api.h:169-174).
"""

__version__ = "0.1.0"

from homerhevc_tpu.config import EncoderConfig  # noqa: F401
from homerhevc_tpu.api import Encoder  # noqa: F401
