"""Headline benchmark: 720p all-intra encode fps (full pipeline: device
analysis + host entropy coding), vs the measured HomerHEVC reference
baseline on this host (BASELINE.md: 3.59 fps all-intra, 1-core SSE4.2).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

BASELINE_FPS = 3.59  # reference all-intra 720p on this host (BASELINE.md)


def main():
    from homerhevc_tpu.api import Encoder
    from homerhevc_tpu.config import EncoderConfig

    W, H, N, B = 1280, 720, 256, 32
    rng = np.random.RandomState(42)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    frames = []
    tex = (rng.rand(H, W) * 40).astype(np.float32)
    for t in range(N):
        y = np.clip(60 + 0.08 * xx + 0.05 * yy + 30 * np.sin(xx / 37.0 + t * 0.3)
                    + np.roll(tex, t * 4, axis=1), 0, 255).astype(np.uint8)
        u = np.clip(128 + 20 * np.sin(xx[::2, ::2] / 53.0 + t * 0.2), 0, 255).astype(np.uint8)
        v = np.clip(128 + 20 * np.cos(yy[::2, ::2] / 41.0 - t * 0.1), 0, 255).astype(np.uint8)
        frames.append((y, u, v))

    cfg = EncoderConfig(width=W, height=H, qp=32, gop_size=0, sao=False,
                        deblocking=False, sign_hiding=True, cu_size=16,
                        num_frames_in_flight=B)
    enc = Encoder(cfg)
    # warmup: 2 batches — compiles the batched wavefront program AND the
    # adaptive values-head slice op (whose first pow2 bucket would
    # otherwise compile during the measured run)
    for f in frames[:2 * B]:
        list(enc.encode(*f))
    list(enc.flush())
    from homerhevc_tpu.utils.profiler import PROFILER
    PROFILER.reset()
    t0 = time.time()
    total_bits = 0
    nf = 0
    for f in frames:
        for ef in enc.encode(*f):
            total_bits += ef.bits
            nf += 1
    for ef in enc.flush():
        total_bits += ef.bits
        nf += 1
    dt = time.time() - t0
    fps = nf / dt
    print(json.dumps({
        "metric": "720p_allintra_encode_fps",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))
    if "--stages" in sys.argv:
        from homerhevc_tpu.utils.profiler import PROFILER
        print(PROFILER.report(), file=sys.stderr)
        print(f"bits/frame: {total_bits / nf:.0f}", file=sys.stderr)


if __name__ == "__main__":
    main()
