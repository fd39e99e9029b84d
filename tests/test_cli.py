"""CLI app: encode a small clip from YUV file, verify output decodes and
recon dump matches (the reference's -o-raw invariant, homer_app.c:511)."""

import numpy as np

from tests.conftest import decode_annexb, make_yuv


def test_cli_roundtrip(tmp_path, rng):
    from homerhevc_tpu.cli import main
    w, h, n = 64, 64, 3
    yuv = tmp_path / "in.yuv"
    with open(yuv, "wb") as f:
        for t in range(n):
            y, u, v = make_yuv(rng, w, h)
            f.write(y.tobytes()); f.write(u.tobytes()); f.write(v.tobytes())
    out = tmp_path / "out.265"
    raw = tmp_path / "rec.yuv"
    rc = main(["-i", str(yuv), "-o", str(out), "-o-raw", str(raw),
               "-widthxheight", f"{w}x{h}", "-gop_size", "1",
               "-intra_period", "0", "-qp", "30", "-sao", "0",
               "-n_frames", str(n)])
    assert rc == 0
    dec = decode_annexb(out)
    assert len(dec) == n
    rec = np.fromfile(raw, np.uint8).reshape(n, h * 3 // 2, w)
    for i in range(n):
        assert np.array_equal(dec[i], rec[i, :h, :]), f"frame {i}"
