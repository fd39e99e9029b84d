import os

# Tests run on CPU with a virtual 8-device mesh so multi-chip sharding logic
# is exercised without TPU hardware (SURVEY.md §4).
# NOTE: this environment's sitecustomize forces jax_platforms="axon,cpu",
# overriding the env var — must override via jax.config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax
jax.config.update("jax_platforms", "cpu")

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(1234)


def make_yuv(rng, w, h, kind="texture"):
    """Synthetic YUV420 frame with structure (gradients + texture + edges)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    y = 60 + 0.1 * xx + 0.07 * yy + 25 * np.sin(xx / 11.0) \
        + 15 * np.cos(yy / 7.0) + rng.rand(h, w) * 12
    y[h // 4:h // 2, w // 4:w // 2] += 60
    u = 128 + 20 * np.sin(xx[::2, ::2] / 23.0) + rng.rand(h // 2, w // 2) * 6
    v = 128 - 15 * np.cos(yy[::2, ::2] / 17.0) + rng.rand(h // 2, w // 2) * 6
    return (np.clip(y, 0, 255).astype(np.uint8),
            np.clip(u, 0, 255).astype(np.uint8),
            np.clip(v, 0, 255).astype(np.uint8))


def decode_annexb(path):
    """Decode an Annex-B .265 file with OpenCV's FFmpeg; returns list of
    luma planes (bit-exact) — the conformance oracle (see BASELINE.md)."""
    import cv2
    cap = cv2.VideoCapture(str(path))
    cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
    frames = []
    while True:
        ok, img = cap.read()
        if not ok:
            break
        frames.append(np.array(img))
    return frames


def decode_annexb_yuv(path, w, h):
    """Decode and return (y, u, v) planes per frame via BGR round-trip for
    chroma (approximate) and raw luma (exact)."""
    import cv2
    cap = cv2.VideoCapture(str(path))
    frames = []
    while True:
        ok, img = cap.read()
        if not ok:
            break
        yuv = cv2.cvtColor(img, cv2.COLOR_BGR2YUV_I420)
        y = yuv[:h, :]
        u = yuv[h:h + h // 4, :].reshape(h // 2, w // 2)
        v = yuv[h + h // 4:, :].reshape(h // 2, w // 2)
        frames.append((y, u, v))
    return frames
