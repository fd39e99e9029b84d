"""Device (JAX) ops must match the golden numpy oracle bit-exactly."""

import numpy as np
import pytest
import jax.numpy as jnp

from homerhevc_tpu.golden import intra_pred as gip
from homerhevc_tpu.golden.transform import forward_transform as g_fwd
from homerhevc_tpu.golden.transform import inverse_transform as g_inv
from homerhevc_tpu.golden.quantize import (
    quantize as g_quant, dequantize as g_deq, sign_bit_hiding as g_sbh)
from homerhevc_tpu.ops.transform import forward_transform, inverse_transform
from homerhevc_tpu.ops.quant import quantize, dequantize, sign_bit_hiding
from homerhevc_tpu.ops import intra as dip
from homerhevc_tpu.hevc import tables as T


@pytest.mark.parametrize("n", [4, 8, 16, 32])
def test_transform_matches_golden(n, rng):
    x = rng.randint(-255, 256, (5, n, n)).astype(np.int32)
    for dst in ([True, False] if n == 4 else [False]):
        c_dev = np.asarray(forward_transform(jnp.asarray(x), dst))
        c_gold = np.stack([g_fwd(x[i], dst) for i in range(5)])
        assert np.array_equal(c_dev, c_gold)
        r_dev = np.asarray(inverse_transform(jnp.asarray(c_gold), dst))
        r_gold = np.stack([g_inv(c_gold[i], dst) for i in range(5)])
        assert np.array_equal(r_dev, r_gold)


@pytest.mark.parametrize("n,qp", [(4, 22), (8, 32), (16, 37), (32, 51), (32, 0)])
def test_quant_matches_golden(n, qp, rng):
    c = rng.randint(-20000, 20000, (4, n, n)).astype(np.int32)
    for sl in (False, True):
        lv_dev = np.asarray(quantize(jnp.asarray(c), n, qp, True, sl))
        lv_gold = np.stack([g_quant(c[i], qp, True, sl) for i in range(4)])
        assert np.array_equal(lv_dev, lv_gold), (n, qp, sl)
        dq_dev = np.asarray(dequantize(jnp.asarray(lv_gold), n, qp, True, sl))
        dq_gold = np.stack([g_deq(lv_gold[i], qp, True, sl) for i in range(4)])
        assert np.array_equal(dq_dev, dq_gold), (n, qp, sl)


@pytest.mark.parametrize("n,scan", [(4, 0), (8, 0), (16, 0), (32, 0), (8, 1), (8, 2)])
def test_sbh_matches_golden(n, scan, rng):
    qp = 30
    c = (rng.randn(6, n, n) * 300).astype(np.int32)
    lv = np.stack([g_quant(c[i], qp, True, False) for i in range(6)])
    out_dev = np.asarray(sign_bit_hiding(jnp.asarray(lv), jnp.asarray(c),
                                         n, qp, True, scan, False))
    out_gold = np.stack([g_sbh(lv[i], c[i], qp, True, scan, False)
                         for i in range(6)])
    assert np.array_equal(out_dev, out_gold), (n, scan)


@pytest.mark.parametrize("n", [4, 8, 16, 32])
@pytest.mark.parametrize("is_luma", [True, False])
def test_prediction_matches_golden(n, is_luma, rng):
    B = 7
    tops = rng.randint(0, 256, (B, 2 * n + 1)).astype(np.int32)
    lefts = rng.randint(0, 256, (B, 2 * n + 1)).astype(np.int32)
    lefts[:, 0] = tops[:, 0]  # shared corner
    pred = dip.predict_all_modes(jnp.asarray(tops), jnp.asarray(lefts), n, is_luma)
    pred = dip.edge_fixes(pred, jnp.asarray(tops), jnp.asarray(lefts), n, is_luma)
    pred = np.asarray(pred)
    for b in range(B):
        for mode in range(35):
            ft, fl = gip.filter_reference_samples(tops[b], lefts[b], n, mode, is_luma)
            ref = gip.predict(ft, fl, n, mode, is_luma)
            assert np.array_equal(pred[b, mode], ref), (n, is_luma, b, mode)


def test_substitution_matches_golden(rng):
    # build a tiny recon plane and compare substituted refs for various
    # availability patterns against golden build_reference_samples
    n = 8
    w = h = 64
    recon = rng.randint(0, 256, (h, w)).astype(np.int32)
    avail = gip.Availability(w, h, 32)
    for (x0, y0) in [(0, 0), (8, 0), (0, 8), (8, 8), (16, 8), (24, 24), (48, 8)]:
        t_g, l_g = gip.build_reference_samples(recon, x0, y0, n, avail)
        # device-style: gather raw seq + avail flags, substitute
        L = 4 * n + 1
        vals = np.zeros((1, L), np.int32)
        flags = np.zeros((1, L), bool)
        for j in range(2 * n):  # left bottom..top
            yy, xx = y0 + 2 * n - 1 - j, x0 - 1
            ok = yy < h and avail.available(x0, y0, xx, yy)
            flags[0, j] = ok
            vals[0, j] = recon[min(yy, h - 1), max(xx, 0)] if ok else 0
        ok = avail.available(x0, y0, x0 - 1, y0 - 1)
        flags[0, 2 * n] = ok
        vals[0, 2 * n] = recon[y0 - 1, x0 - 1] if ok else 0
        for i in range(2 * n):
            xx, yy = x0 + i, y0 - 1
            ok = xx < w and avail.available(x0, y0, xx, yy)
            flags[0, 2 * n + 1 + i] = ok
            vals[0, 2 * n + 1 + i] = recon[max(yy, 0), min(xx, w - 1)] if ok else 0
        sub = np.asarray(dip.substitute_refs(jnp.asarray(vals), jnp.asarray(flags)))[0]
        left_dev = sub[:2 * n][::-1]
        corner_dev = sub[2 * n]
        top_dev = sub[2 * n + 1:]
        assert np.array_equal(np.concatenate([[corner_dev], top_dev]), t_g), (x0, y0)
        assert np.array_equal(np.concatenate([[corner_dev], left_dev]), l_g), (x0, y0)


def test_pack_sparse8_roundtrip(rng):
    """int8 wire format: values round-trip exactly, including escapes
    outside [-128, 127]."""
    from homerhevc_tpu.ops.pack import (esc_capacity, pack_capacity,
                                        pack_sparse8, unpack_sparse8)
    h, w = 32, 64
    n_tot = h * w * 3 // 2
    y = np.zeros((h, w), np.int16)
    u = np.zeros((h // 2, w // 2), np.int16)
    v = np.zeros((h // 2, w // 2), np.int16)
    # sparse fill incl. int8-overflow escapes at scattered positions
    ys = rng.choice(h * w, 40, replace=False)
    y.reshape(-1)[ys] = rng.randint(-300, 300, 40).astype(np.int16)
    u[3, 5], v[7, 9] = 1000, -1000
    C = pack_capacity(n_tot, 32)
    import jax.numpy as jnp
    bm, v8, ei, ev, cnt, ecnt = pack_sparse8(
        [jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)], C)
    cnt, ecnt = int(cnt), int(ecnt)
    assert ecnt <= esc_capacity(n_tot, C)
    py, pu, pv = unpack_sparse8(np.asarray(bm), np.asarray(v8)[:cnt],
                                np.asarray(ei)[:ecnt], np.asarray(ev)[:ecnt],
                                [(h, w), (h // 2, w // 2), (h // 2, w // 2)])
    np.testing.assert_array_equal(py, y)
    np.testing.assert_array_equal(pu, u)
    np.testing.assert_array_equal(pv, v)


def test_pack_sparse2_roundtrip(rng):
    """2-bit wire format: +-1/+-2 codes plus escapes round-trip exactly
    through both the numpy and the native C unpack."""
    from homerhevc_tpu.ops.pack import (esc_capacity, pack_capacity,
                                        pack_sparse2, unpack_sparse2)
    from homerhevc_tpu.native import unpack_sparse2_native
    h, w = 32, 64
    n_tot = h * w * 3 // 2
    y = np.zeros((h, w), np.int16)
    u = np.zeros((h // 2, w // 2), np.int16)
    v = np.zeros((h // 2, w // 2), np.int16)
    ys = rng.choice(h * w, 60, replace=False)
    y.reshape(-1)[ys] = rng.choice([1, -1, 1, -1, 2, -2, 5, -300],
                                   60).astype(np.int16)
    u[3, 5], v[7, 9] = 1000, -3
    C = pack_capacity(n_tot, 32)
    import jax.numpy as jnp
    bm, v2, ei, ev, cnt, ecnt = pack_sparse2(
        [jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)], C)
    cnt, ecnt = int(cnt), int(ecnt)
    assert ecnt <= esc_capacity(n_tot, C)
    shapes = [(h, w), (h // 2, w // 2), (h // 2, w // 2)]
    nb = -(-cnt // 4)
    py, pu, pv = unpack_sparse2(np.asarray(bm), np.asarray(v2)[:nb], cnt,
                                np.asarray(ei)[:ecnt], np.asarray(ev)[:ecnt],
                                shapes)
    np.testing.assert_array_equal(py, y)
    np.testing.assert_array_equal(pu, u)
    np.testing.assert_array_equal(pv, v)
    buf = np.empty(n_tot, np.int16)
    assert unpack_sparse2_native(np.asarray(bm), np.asarray(v2)[:nb], cnt,
                                 np.asarray(ei)[:ecnt],
                                 np.asarray(ev)[:ecnt], n_tot, buf)
    flat = np.concatenate([y.ravel(), u.ravel(), v.ravel()])
    np.testing.assert_array_equal(buf, flat)


def test_pack_sparse_cg_roundtrip(rng):
    """Two-tier CG wire format: CG bitmap + compacted 16-bit masks +
    2-bit codes + escapes round-trip exactly through both the numpy and
    the native C unpack."""
    from homerhevc_tpu.ops.pack import (cg_cap, esc_capacity, pack_capacity,
                                        pack_sparse_cg, unpack_sparse_cg)
    from homerhevc_tpu.native import unpack_sparse_cg_native
    h, w = 32, 64
    n_tot = h * w * 3 // 2
    y = np.zeros((h, w), np.int16)
    u = np.zeros((h // 2, w // 2), np.int16)
    v = np.zeros((h // 2, w // 2), np.int16)
    ys = rng.choice(h * w, 60, replace=False)
    y.reshape(-1)[ys] = rng.choice([1, -1, 1, -1, 2, -2, 5, -300],
                                   60).astype(np.int16)
    u[3, 5], v[7, 9] = 1000, -3
    # a dense CG exercises multi-bit masks
    y[8:12, 16:20] = rng.choice([1, -1, 2], (4, 4)).astype(np.int16)
    C = pack_capacity(n_tot, 32)
    CG = cg_cap(n_tot, 32)
    import jax.numpy as jnp
    bm, mk, cd, ei, ev, cnt, ecnt, ccnt = pack_sparse_cg(
        [jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)], C, CG)
    cnt, ecnt, ccnt = int(cnt), int(ecnt), int(ccnt)
    assert ecnt <= esc_capacity(n_tot, C) and ccnt <= CG
    shapes = [(h, w), (h // 2, w // 2), (h // 2, w // 2)]
    py, pu, pv = unpack_sparse_cg(np.asarray(bm), np.asarray(mk),
                                  np.asarray(cd), cnt, ccnt,
                                  np.asarray(ei)[:ecnt],
                                  np.asarray(ev)[:ecnt], shapes)
    np.testing.assert_array_equal(py, y)
    np.testing.assert_array_equal(pu, u)
    np.testing.assert_array_equal(pv, v)
    buf = np.empty(n_tot, np.int16)
    assert unpack_sparse_cg_native(np.asarray(bm), np.asarray(mk),
                                   np.asarray(cd), cnt, ccnt,
                                   np.asarray(ei)[:ecnt],
                                   np.asarray(ev)[:ecnt], n_tot, buf,
                                   shapes)
    # the native unpack de-blocks the wire back to raster planes
    flat = np.concatenate([y.ravel(), u.ravel(), v.ravel()])
    np.testing.assert_array_equal(buf, flat)


@pytest.mark.parametrize("n", [4, 8, 16, 32])
@pytest.mark.parametrize("is_luma", [True, False])
def test_predict_mode_matches_golden(n, is_luma, rng):
    """Single-mode prediction with TRACED mode (tree encode pass) must be
    bit-exact to golden predict incl. filtering + edge fixes."""
    if n == 32 and not is_luma:
        return
    B = 35
    top = rng.randint(0, 256, (B, 2 * n + 1)).astype(np.int32)
    left = rng.randint(0, 256, (B, 2 * n + 1)).astype(np.int32)
    left[:, 0] = top[:, 0]  # shared corner
    modes = np.arange(35, dtype=np.int32)
    out = np.asarray(dip.predict_mode(
        jnp.asarray(top), jnp.asarray(left), n, jnp.asarray(modes), is_luma))
    for m in range(35):
        ft, fl = gip.filter_reference_samples(top[m], left[m], n, m, is_luma)
        ref = gip.predict(ft, fl, n, m, is_luma)
        assert np.array_equal(out[m], ref), f"mode {m} n {n} luma {is_luma}"


def test_quant_per_block_qp_vector(rng):
    """quantize/dequantize/SBH with a PER-BLOCK traced QP vector must
    equal per-block static-QP calls (the device per-CTB AQ contract)."""
    import jax
    import jax.numpy as jnp
    from homerhevc_tpu.ops.quant import (dequantize, quantize,
                                         sign_bit_hiding)
    n, B = 16, 6
    coef = rng.randint(-2000, 2000, (B, n, n)).astype(np.int32)
    qps = np.array([22, 27, 30, 34, 37, 45], np.int32)

    @jax.jit
    def run(c, q):
        lvl = quantize(c, n, q, True)
        lvl = sign_bit_hiding(lvl, c, n, q, True, 0)
        deq = dequantize(lvl, n, q, True)
        return lvl, deq
    lvl_v, deq_v = run(jnp.asarray(coef), jnp.asarray(qps))
    for i, q in enumerate(qps):
        lvl_s = quantize(jnp.asarray(coef[i]), n, int(q), True)
        lvl_s = sign_bit_hiding(lvl_s, jnp.asarray(coef[i]), n, int(q),
                                True, 0)
        deq_s = dequantize(lvl_s, n, int(q), True)
        np.testing.assert_array_equal(np.asarray(lvl_v[i]),
                                      np.asarray(lvl_s))
        np.testing.assert_array_equal(np.asarray(deq_v[i]),
                                      np.asarray(deq_s))
