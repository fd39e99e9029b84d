"""Regenerate the RD-comparison clips in /tmp/clips (not preserved between
rounds) and print the reference-encoder build recipe.

Content (round-2 recipe, BASELINE.md): rolling random texture (4 px/frame)
+ sinusoid drift + moving box + 2-sigma per-frame sensor noise. Both
encoders must be measured on the SAME files.

Usage:  python tools/make_clips.py [--frames 50]

Reference build (out-of-tree; the published -O3 build segfaults under
gcc 12):
  mkdir -p /tmp/refbuild && cd /tmp/refbuild && \
  gcc -O2 -fno-strict-aliasing -fcommon -msse4.2 -w -I/root/reference/src/homer_lib \
      /root/reference/src/homer_lib/*.c /root/reference/src/homer_app/*.c \
      -o homer_app -lm -lpthread
"""

import argparse
import os

import numpy as np


def gen_clip(path: str, w: int, h: int, n: int, seed: int = 7) -> None:
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    tex = (rng.rand(h, w) * 60).astype(np.float32)
    cyy, cxx = np.mgrid[0:h // 2, 0:w // 2].astype(np.float32)
    with open(path, "wb") as f:
        for t in range(n):
            y = (60 + 0.06 * xx + 0.04 * yy
                 + 25 * np.sin(xx / 41.0 + t * 0.25)
                 + np.roll(tex, t * 4, axis=1))
            # moving box
            bx = int(w * 0.2 + t * 6) % (w - 160)
            by = int(h * 0.3 + t * 2) % (h - 120)
            y[by:by + 120, bx:bx + 160] = 200 - 0.2 * xx[:120, :160]
            # 2-sigma per-frame sensor noise
            y = y + rng.randn(h, w) * 2.0
            u = 128 + 18 * np.sin(cxx / 53.0 + t * 0.2) \
                + rng.randn(h // 2, w // 2) * 1.0
            v = 128 + 18 * np.cos(cyy / 47.0 - t * 0.15) \
                + rng.randn(h // 2, w // 2) * 1.0
            f.write(np.clip(y, 0, 255).astype(np.uint8).tobytes())
            f.write(np.clip(u, 0, 255).astype(np.uint8).tobytes())
            f.write(np.clip(v, 0, 255).astype(np.uint8).tobytes())


def gen_pan_clip(path: str, w: int, h: int, n: int, vel: int = 90,
                 seed: int = 11) -> None:
    """High-motion clip for the FAR-ME (me_range) rows: a rigid pan at
    `vel` full-pel/frame (default 90 — beyond a +-64 window, inside
    +-128, matching the reference's +-128x64 far search,
    hmr_motion_inter.c FAR range)."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    tex = (rng.rand(h, w) * 70).astype(np.float32)
    cyy, cxx = np.mgrid[0:h // 2, 0:w // 2].astype(np.float32)
    with open(path, "wb") as f:
        for t in range(n):
            y = (70 + 20 * np.sin((xx + t * vel) / 61.0)
                 + np.roll(tex, t * vel, axis=1)
                 + 15 * np.sin(yy / 37.0))
            u = 128 + 15 * np.sin((cxx + t * vel / 2) / 43.0)
            v = 128 + 15 * np.cos((cyy) / 53.0 + t * 0.1)
            f.write(np.clip(y, 0, 255).astype(np.uint8).tobytes())
            f.write(np.clip(u, 0, 255).astype(np.uint8).tobytes())
            f.write(np.clip(v, 0, 255).astype(np.uint8).tobytes())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=50)
    args = ap.parse_args()
    os.makedirs("/tmp/clips", exist_ok=True)
    gen_clip("/tmp/clips/synthetic_720p.yuv", 1280, 720, args.frames)
    gen_clip("/tmp/clips/synthetic_1080p.yuv", 1920, 1080, args.frames)
    gen_pan_clip("/tmp/clips/pan_720p.yuv", 1280, 720, args.frames)
    print("wrote /tmp/clips/{synthetic_720p,synthetic_1080p,pan_720p}.yuv "
          f"({args.frames} frames)")


if __name__ == "__main__":
    main()
