"""Batched integer transforms (JAX): HEVC DCT 4/8/16/32 + DST 4x4.

Bit-exact integer semantics identical to golden/transform.py (the numpy
oracle), formulated as batched int32 einsums. All FLOPs here are integer —
they run on the VPU; the MXU int8 path is a later optimization (values
exceed f32-exact range so bf16/f32 MXU cannot be used directly).

Parity: reference hmr_sse42_functions_transform.c / hmr_transform.c:514-587.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from homerhevc_tpu.hevc.tables import DCT, DST4


def _mats(n: int, is_dst: bool) -> jnp.ndarray:
    return jnp.asarray(DST4 if (is_dst and n == 4) else DCT[n], jnp.int32)


def forward_transform(res: jnp.ndarray, is_dst: bool, bit_depth: int = 8) -> jnp.ndarray:
    """res: (..., N, N) int32 residual -> (..., N, N) int32 coefficients.

    coef = ((T @ X + r1) >> s1 applied col-wise, then row-wise with T^T):
    matches golden: tmp = (T @ X^T + r1) >> s1 ; coef = (T @ tmp^T + r2) >> s2.
    """
    n = res.shape[-1]
    log2n = n.bit_length() - 1
    t = _mats(n, is_dst)
    s1 = log2n - 1 + bit_depth - 8
    s2 = log2n + 6
    x = res.astype(jnp.int32)
    # tmp[k, j] = sum_i T[k,i] * X[j, i]  (contract over last axis of X)
    tmp = (jnp.einsum("ki,...ji->...kj", t, x) + (1 << (s1 - 1))) >> s1
    coef = (jnp.einsum("ki,...ji->...kj", t, tmp) + (1 << (s2 - 1))) >> s2
    return coef


def inverse_transform(coef: jnp.ndarray, is_dst: bool, bit_depth: int = 8) -> jnp.ndarray:
    """Decoder-exact inverse (spec 8.6.4.2): columns first then rows,
    16-bit clamp between and after stages."""
    n = coef.shape[-1]
    t = _mats(n, is_dst)
    s1, s2 = 7, 20 - bit_depth
    c = coef.astype(jnp.int32)
    # stage1 = (T^T @ C + 64) >> 7, clip
    tmp = (jnp.einsum("ki,...kj->...ij", t, c) + (1 << (s1 - 1))) >> s1
    tmp = jnp.clip(tmp, -32768, 32767)
    # stage2 = (tmp @ T + 2048) >> 12, clip ; computed as (T^T @ tmp^T)^T
    out = (jnp.einsum("kj,...ik->...ij", t, tmp) + (1 << (s2 - 1))) >> s2
    return jnp.clip(out, -32768, 32767)
