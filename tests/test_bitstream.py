import numpy as np
import pytest

from homerhevc_tpu.hevc.bitstream import BitWriter, ebsp_escape, make_nal
from homerhevc_tpu.hevc import tables as T


def test_write_bits():
    bw = BitWriter()
    bw.write(0b101, 3)
    bw.write(0b11111, 5)
    assert bw.get_bytes() == bytes([0b10111111])


def test_ue_values():
    # ue(v): 0->1, 1->010, 2->011, 3->00100
    for val, bits in [(0, "1"), (1, "010"), (2, "011"), (3, "00100"),
                      (4, "00101"), (7, "0001000")]:
        bw = BitWriter()
        bw.write_ue(val)
        bw.align_zero()
        got = "".join(f"{b:08b}" for b in bw.get_bytes())
        assert got.startswith(bits), (val, got, bits)


def test_se_values():
    # se(v): 0->0, 1->1, -1->2, 2->3, -2->4
    pairs = [(0, 0), (1, 1), (-1, 2), (2, 3), (-2, 4)]
    for sval, ueq in pairs:
        b1, b2 = BitWriter(), BitWriter()
        b1.write_se(sval)
        b2.write_ue(ueq)
        b1.align_zero(); b2.align_zero()
        assert b1.get_bytes() == b2.get_bytes(), sval


def test_ebsp():
    assert ebsp_escape(b"\x00\x00\x00") == b"\x00\x00\x03\x00"
    assert ebsp_escape(b"\x00\x00\x01") == b"\x00\x00\x03\x01"
    assert ebsp_escape(b"\x00\x00\x04") == b"\x00\x00\x04"
    assert ebsp_escape(b"\x00\x00\x00\x00\x00") == b"\x00\x00\x03\x00\x00\x03\x00"


def test_nal_header():
    nal = make_nal(33, b"\x42")
    assert nal[0] == 33 << 1 and nal[1] == 1


def test_scan_orders():
    s4 = T.coeff_scan(2, T.SCAN_DIAG)
    assert list(s4[:6]) == [0, 4, 1, 8, 5, 2]
    sh = T.coeff_scan(2, T.SCAN_HOR)
    assert list(sh) == list(range(16))
    sv = T.coeff_scan(2, T.SCAN_VER)
    assert list(sv[:5]) == [0, 4, 8, 12, 1]
    # 8x8: first CG is top-left 4x4 in diag order
    s8 = T.coeff_scan(3, T.SCAN_DIAG)
    assert list(s8[:3]) == [0, 8, 1]
    assert len(set(s8.tolist())) == 64


def test_dct_matrices_spec_exact():
    assert np.array_equal(T.DCT4, [[64, 64, 64, 64], [83, 36, -36, -83],
                                   [64, -64, -64, 64], [36, -83, 83, -36]])
    assert np.array_equal(
        T.DCT32[:, 0],
        [64, 90, 90, 90, 89, 88, 87, 85, 83, 82, 80, 78, 75, 73, 70, 67,
         64, 61, 57, 54, 50, 46, 43, 38, 36, 31, 25, 22, 18, 13, 9, 4])
    assert np.array_equal(T.DCT16[1][:4], [90, 87, 80, 70])


def test_transform_roundtrip():
    from homerhevc_tpu.golden.transform import forward_transform, inverse_transform
    rng = np.random.RandomState(7)
    for n in (4, 8, 16, 32):
        x = rng.randint(-255, 256, (n, n))
        c = forward_transform(x, False)
        r = inverse_transform(c, False)
        err = np.abs(r - x).max()
        # HEVC integer matrices are near-orthogonal; a few LSB of error on
        # full-range random residuals is expected (matches HM behaviour)
        assert err <= 4, (n, err)
    # DST 4x4
    x = rng.randint(-255, 256, (4, 4))
    r = inverse_transform(forward_transform(x, True), True)
    assert np.abs(r - x).max() <= 4


def test_quant_roundtrip():
    from homerhevc_tpu.golden.quantize import quantize, dequantize
    rng = np.random.RandomState(8)
    for qp in (0, 22, 32, 51):
        for n in (4, 8, 32):
            c = rng.randint(-2000, 2000, (n, n))
            lv = quantize(c, qp, True)
            dq = dequantize(lv, qp, True)
            step = 2 ** (qp / 6.0)
            # dequantized value within ~1.5 quant steps of original
            assert np.abs(dq - c).max() <= max(4, 2.0 * step * 26), qp
