"""Device-side sparse packing of quantized coefficient planes.

The encoder's device->host link carries the quantized levels to the host
CABAC serializer. At working QPs ~97% of levels are zero, so shipping full
int16 planes wastes the (slow, ~25 MB/s tunnel) link. Instead the device
emits:

  bitmap  uint8  (N/8,)  significance bitmap, little-endian bit order
  vals    int16  (C,)    the nonzero levels in raster order (compacted
                         with a stable key sort -- no scatter, scatters
                         serialize on TPU)
  count   int32  ()      number of nonzeros actually present

C is a static capacity; when count > C (pathological content / very low
QP) the host falls back to fetching the full planes, which the encoder
also returns as device-resident outputs (unfetched device outputs cost
HBM only, no link traffic).

This plays the role of the reference's shared-memory handoff between the
WPP workers and the entropy tier (hmr_encoder_lib.c:2948 chaining) -- on
a host/device split machine the handoff is a link transfer, so it gets
an explicit compact wire format.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_WEIGHTS = np.array([1, 2, 4, 8, 16, 32, 64, 128], np.int32)


def pack_capacity(n_total: int, qp: int) -> int:
    """Static compaction capacity: generous at high QP, full at low QP."""
    if qp >= 30:
        frac = 6
    elif qp >= 24:
        frac = 4
    elif qp >= 18:
        frac = 2
    else:
        return n_total
    # round up to a multiple of 8 lanes
    c = -(-n_total // frac)
    return -(-c // 8) * 8


def pack_sparse(planes, capacity: int):
    """planes: list of int-typed 2D arrays. Returns (bitmap u8, vals i16,
    count i32). Raster order per plane, planes concatenated in list order."""
    flat = jnp.concatenate([p.reshape(-1) for p in planes]).astype(jnp.int16)
    n = flat.shape[0]
    assert n % 8 == 0
    nz = flat != 0
    bits = nz.reshape(-1, 8).astype(jnp.int32)
    bitmap = (bits * jnp.asarray(_WEIGHTS)[None, :]).sum(axis=1) \
        .astype(jnp.uint8)
    count = jnp.sum(nz.astype(jnp.int32))
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(-1)
    key = jnp.where(nz, idx, jnp.int32(1) << 30)
    _, svals = jax.lax.sort((key, flat), num_keys=1)
    return bitmap, svals[:capacity], count


def unpack_sparse(bitmap: np.ndarray, vals: np.ndarray, shapes):
    """Host inverse: bitmap (N/8,) u8, vals (count,) i16, shapes list of
    (h, w). Returns list of int16 planes."""
    nzmask = np.unpackbits(np.asarray(bitmap, np.uint8),
                           bitorder="little").astype(bool)
    n = sum(h * w for h, w in shapes)
    nzmask = nzmask[:n]
    out = np.zeros(n, np.int16)
    out[nzmask] = np.asarray(vals, np.int16)
    planes = []
    off = 0
    for h, w in shapes:
        planes.append(out[off:off + h * w].reshape(h, w))
        off += h * w
    return planes


def esc_capacity(n_total: int, capacity: int) -> int:
    """Escape-list capacity for the int8 wire format: levels outside
    [-128, 127] only occur on extreme blocks (|coef| > 128*qstep), so a
    small per-frame list suffices; overflow falls back to full planes.
    Never larger than the packed-values capacity (escape indices point
    into the packed array)."""
    return min(capacity, max(2048, -(-n_total // 512)))


def pack_sparse8(planes, capacity: int):
    """int8 wire variant of pack_sparse: nonzero levels ship as int8
    (halving the dominant device->host transfer) plus an escape list
    (packed-order index, int16 value) for the rare levels outside the
    int8 range. Returns (bitmap u8, vals8 i8, esc_idx i32, esc_val i16,
    count i32, esc_count i32)."""
    flat = jnp.concatenate([p.reshape(-1) for p in planes]).astype(jnp.int16)
    n = flat.shape[0]
    assert n % 8 == 0
    nz = flat != 0
    bits = nz.reshape(-1, 8).astype(jnp.int32)
    bitmap = (bits * jnp.asarray(_WEIGHTS)[None, :]).sum(axis=1) \
        .astype(jnp.uint8)
    count = jnp.sum(nz.astype(jnp.int32))
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(-1)
    key = jnp.where(nz, idx, jnp.int32(1) << 30)
    _, svals = jax.lax.sort((key, flat), num_keys=1)
    svals = svals[:capacity]
    vals8 = jnp.clip(svals, -128, 127).astype(jnp.int8)
    # escapes: packed positions whose int8 clamp lost information
    E = esc_capacity(n, capacity)
    pos = jax.lax.broadcasted_iota(jnp.int32, (capacity, 1), 0).reshape(-1)
    is_esc = (svals != vals8.astype(jnp.int16)) & (pos < count)
    esc_count = jnp.sum(is_esc.astype(jnp.int32))
    ekey = jnp.where(is_esc, pos, jnp.int32(1) << 30)
    sidx, sval = jax.lax.sort((ekey, svals), num_keys=1)
    return bitmap, vals8, sidx[:E], sval[:E], count, esc_count


def pack_sparse2(planes, capacity: int):
    """2-bit wire variant: at working QPs ~96%% of nonzero levels are +-1
    and ~99.8%% within +-2 (measured on the bench content), so each
    nonzero ships as a 2-bit code {+1, -1, +2, -2}; the rare larger
    levels ride the escape list (packed-order index, int16 value).
    Returns (bitmap u8, codes u8 (capacity/4), esc_idx i32, esc_val i16,
    count i32, esc_count i32). capacity must be a multiple of 4."""
    assert capacity % 4 == 0
    flat = jnp.concatenate([p.reshape(-1) for p in planes]).astype(jnp.int16)
    n = flat.shape[0]
    assert n % 8 == 0
    nz = flat != 0
    bits = nz.reshape(-1, 8).astype(jnp.int32)
    bitmap = (bits * jnp.asarray(_WEIGHTS)[None, :]).sum(axis=1) \
        .astype(jnp.uint8)
    count = jnp.sum(nz.astype(jnp.int32))
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(-1)
    key = jnp.where(nz, idx, jnp.int32(1) << 30)
    _, svals = jax.lax.sort((key, flat), num_keys=1)
    svals = svals[:capacity]
    # code: 0=+1 1=-1 2=+2 3=-2 (escaped values keep code 0; the host
    # overwrites them from the escape list)
    code = jnp.where(svals == -1, 1,
                     jnp.where(svals == 2, 2,
                               jnp.where(svals == -2, 3, 0))) \
        .astype(jnp.int32)
    packed = (code.reshape(-1, 4)
              * jnp.asarray([1, 4, 16, 64], jnp.int32)[None, :]) \
        .sum(axis=1).astype(jnp.uint8)
    E = esc_capacity(n, capacity)
    pos = jax.lax.broadcasted_iota(jnp.int32, (capacity, 1), 0).reshape(-1)
    is_esc = (jnp.abs(svals) > 2) & (pos < count)
    esc_count = jnp.sum(is_esc.astype(jnp.int32))
    ekey = jnp.where(is_esc, pos, jnp.int32(1) << 30)
    sidx, sval = jax.lax.sort((ekey, svals), num_keys=1)
    return bitmap, packed, sidx[:E], sval[:E], count, esc_count


def _blk4(p):
    """Reorder a plane into spatial 4x4-block raster order: block (by,bx)
    occupies 16 consecutive positions, raster within the block. This makes
    every 16-coefficient wire group a real HEVC coefficient group, so the
    host serializer can code residuals straight off the wire (no dense
    unpack, no re-scan)."""
    h, w = p.shape
    return p.reshape(h // 4, 4, w // 4, 4).transpose(0, 2, 1, 3).reshape(-1)


def _unblk4(flat, h, w):
    """Host inverse of _blk4 (numpy)."""
    return flat.reshape(h // 4, w // 4, 4, 4).transpose(0, 2, 1, 3) \
        .reshape(h, w)


def cg_cap(n_total: int, qp: int) -> int:
    """Static capacity for the compacted per-CG significance masks:
    one uint16 per 4x4 coefficient group with at least one nonzero.
    Sized from QP like pack_capacity; overflow falls back to the full
    device planes."""
    if qp >= 30:
        d = 48
    elif qp >= 24:
        d = 24
    else:
        return n_total // 16
    return min(n_total // 16, -(-n_total // d // 8) * 8)


def pack_sparse_cg(planes, capacity: int, cgcap: int):
    """Two-tier CG wire format: the flat 1-bit-per-coefficient bitmap of
    pack_sparse2 (n/8 bytes -- the dominant fixed transfer cost) becomes
      cg_bitmap  u8   (n/128,)  1 bit per 4x4 coefficient group
      masks      i16  (cgcap,)  16-bit significance mask of each nonzero
                                CG, compacted in raster-CG order
    Values stay the 2-bit code wire {+1,-1,+2,-2} + escape list.

    Planes ride in SPATIAL 4x4-BLOCK order (_blk4): wire CG i of plane p
    is the coefficient group at block coords (i // (w/4), i %% (w/4)),
    mask bit k its coefficient (k // 4, k %% 4). The host serializer can
    therefore code residual syntax directly from the wire; escape indices
    index the packed value order as before. Returns (cg_bitmap, masks16,
    codes u8 (capacity/4), esc_idx i32, esc_val i16, count, esc_count,
    cg_count)."""
    assert capacity % 4 == 0
    flat = jnp.concatenate([_blk4(p) for p in planes]).astype(jnp.int16)
    n = flat.shape[0]
    assert n % 128 == 0
    cg = flat.reshape(-1, 16)
    nzb = (cg != 0).astype(jnp.int32)
    mask16 = (nzb * (jnp.int32(1) << jnp.arange(16, dtype=jnp.int32))[None]) \
        .sum(axis=1)                                     # (ncg,) 0..65535
    cg_nz = mask16 != 0
    cg_count = jnp.sum(cg_nz.astype(jnp.int32))
    cg_bitmap = (cg_nz.reshape(-1, 8).astype(jnp.int32)
                 * jnp.asarray(_WEIGHTS)[None, :]).sum(axis=1) \
        .astype(jnp.uint8)
    ncg = n // 16
    cidx = jax.lax.broadcasted_iota(jnp.int32, (ncg, 1), 0).reshape(-1)
    ckey = jnp.where(cg_nz, cidx, jnp.int32(1) << 30)
    _, smasks = jax.lax.sort((ckey, mask16.astype(jnp.int16)), num_keys=1)
    smasks = smasks[:cgcap]
    nz = flat != 0
    count = jnp.sum(nz.astype(jnp.int32))
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(-1)
    key = jnp.where(nz, idx, jnp.int32(1) << 30)
    _, svals = jax.lax.sort((key, flat), num_keys=1)
    svals = svals[:capacity]
    code = jnp.where(svals == -1, 1,
                     jnp.where(svals == 2, 2,
                               jnp.where(svals == -2, 3, 0))) \
        .astype(jnp.int32)
    codes = (code.reshape(-1, 4)
             * jnp.asarray([1, 4, 16, 64], jnp.int32)[None, :]) \
        .sum(axis=1).astype(jnp.uint8)
    E = esc_capacity(n, capacity)
    pos = jax.lax.broadcasted_iota(jnp.int32, (capacity, 1), 0).reshape(-1)
    is_esc = (jnp.abs(svals) > 2) & (pos < count)
    esc_count = jnp.sum(is_esc.astype(jnp.int32))
    ekey = jnp.where(is_esc, pos, jnp.int32(1) << 30)
    sidx, sval = jax.lax.sort((ekey, svals), num_keys=1)
    return (cg_bitmap, smasks, codes, sidx[:E], sval[:E], count, esc_count,
            cg_count)


def unpack_sparse_cg(cg_bitmap, masks16, codes, count, cg_count,
                     esc_idx, esc_val, shapes):
    """Host inverse of pack_sparse_cg (numpy fallback; native twin is
    hevcenc_unpack_sparse_cg)."""
    n = sum(h * w for h, w in shapes)
    cgnz = np.unpackbits(np.asarray(cg_bitmap, np.uint8),
                         bitorder="little")[:n // 16].astype(bool)
    nz_cg = np.flatnonzero(cgnz)
    assert len(nz_cg) == cg_count
    m = np.asarray(masks16[:cg_count], np.int16).astype(np.uint16)
    bits = ((m[:, None] >> np.arange(16)) & 1).astype(bool)
    flat_pos = (nz_cg[:, None] * 16 + np.arange(16))[bits]
    cb = np.asarray(codes, np.uint8)
    code4 = np.stack([(cb >> s) & 3 for s in (0, 2, 4, 6)], axis=1) \
        .reshape(-1)[:count]
    vals = _CODE_LUT[code4]
    if len(esc_idx):
        vals[np.asarray(esc_idx)] = np.asarray(esc_val, np.int16)
    out = np.zeros(n, np.int16)
    out[flat_pos] = vals
    planes = []
    off = 0
    for h, w in shapes:
        planes.append(_unblk4(out[off:off + h * w], h, w))
        off += h * w
    return planes


_CODE_LUT = np.asarray([1, -1, 2, -2], np.int16)


def unpack_sparse2(bitmap, codes, count, esc_idx, esc_val, shapes):
    """Host inverse of pack_sparse2 (numpy fallback; the native C twin is
    hevcenc_unpack_sparse2)."""
    nzmask = np.unpackbits(np.asarray(bitmap, np.uint8),
                           bitorder="little").astype(bool)
    n = sum(h * w for h, w in shapes)
    nzmask = nzmask[:n]
    cb = np.asarray(codes, np.uint8)
    code4 = np.stack([(cb >> s) & 3 for s in (0, 2, 4, 6)], axis=1) \
        .reshape(-1)[:count]
    vals = _CODE_LUT[code4]
    if len(esc_idx):
        vals[np.asarray(esc_idx)] = np.asarray(esc_val, np.int16)
    out = np.zeros(n, np.int16)
    out[nzmask] = vals
    planes = []
    off = 0
    for h, w in shapes:
        planes.append(out[off:off + h * w].reshape(h, w))
        off += h * w
    return planes


def unpack_sparse8(bitmap, vals8, esc_idx, esc_val, shapes):
    """Host inverse of pack_sparse8. vals8 length == count; esc arrays
    length == esc_count (already sliced by the caller)."""
    nzmask = np.unpackbits(np.asarray(bitmap, np.uint8),
                           bitorder="little").astype(bool)
    n = sum(h * w for h, w in shapes)
    nzmask = nzmask[:n]
    out = np.zeros(n, np.int16)
    out[nzmask] = np.asarray(vals8, np.int8).astype(np.int16)
    if len(esc_idx):
        nzpos = np.flatnonzero(nzmask)
        out[nzpos[np.asarray(esc_idx)]] = np.asarray(esc_val, np.int16)
    planes = []
    off = 0
    for h, w in shapes:
        planes.append(out[off:off + h * w].reshape(h, w))
        off += h * w
    return planes
