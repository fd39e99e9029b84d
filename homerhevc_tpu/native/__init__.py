"""ctypes bindings for the native host entropy coder (hevcenc.cpp).

Builds libhevcenc.so on first use (g++ -O3); falls back to the pure-Python
serializer when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "hevcenc.cpp")
_SO = os.path.join(_DIR, "libhevcenc.so")
_lib = None


def _build() -> bool:
    try:
        if (os.path.exists(_SO)
                and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
            return True
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True, capture_output=True)
        return True
    except Exception:
        return False


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not _build():
        return None
    lib = ctypes.CDLL(_SO)
    lib.hevcenc_encode_slice.restype = ctypes.c_long
    lib.hevcenc_encode_slice.argtypes = [
        ctypes.c_char_p,                          # ctx_init
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_long,
    ]
    _lib = lib
    return lib


def encode_slice_native(ps, desc, ctx_init: np.ndarray,
                        sign_hiding: bool) -> bytes | None:
    """Run the C++ serializer; returns the CABAC payload bytes (byte-aligned,
    includes rbsp stop bit + padding) or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    cap = desc.width * desc.height * 4 + 4096
    out = np.zeros(cap, np.uint8)

    def b(a, dt):
        return np.ascontiguousarray(a, dt).tobytes()

    cu_depth = b(desc.cu_depth, np.uint8)
    part_nxn = b(desc.part_nxn.astype(np.uint8), np.uint8)
    luma_mode = b(desc.luma_mode, np.uint8)
    chroma_mode = b(desc.chroma_mode, np.uint8)
    tr_depth = b(desc.tr_depth, np.uint8)
    coef_y = np.ascontiguousarray(desc.coef_y, np.int16)
    coef_u = np.ascontiguousarray(desc.coef_u, np.int16)
    coef_v = np.ascontiguousarray(desc.coef_v, np.int16)
    n = lib.hevcenc_encode_slice(
        ctx_init.tobytes(),
        desc.width, desc.height, ps.log2_ctu, ps.log2_min_cb,
        ps.log2_min_tb, ps.log2_max_tb, ps.max_tr_depth_intra,
        int(sign_hiding),
        cu_depth, part_nxn, luma_mode, chroma_mode, tr_depth,
        coef_y.ctypes.data_as(ctypes.c_void_p),
        coef_u.ctypes.data_as(ctypes.c_void_p),
        coef_v.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p), cap)
    if n < 0:
        return None
    return out[:n].tobytes()
