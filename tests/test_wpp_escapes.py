"""WPP entry_point_offset correction for emulation-prevention bytes
(spec 7.4.7.1; reference count_needed_start_codes hmr_headers.c:626)."""

import numpy as np

from homerhevc_tpu.hevc.bitstream import ebsp_escape, ebsp_row_escapes


def _check(rows):
    payload = b"".join(rows)
    sizes = [len(r) for r in rows]
    esc = ebsp_row_escapes(payload, sizes)
    # invariant: escaped-domain row boundaries = raw sizes + per-row escapes
    escaped = ebsp_escape(payload)
    acc_raw, acc_esc = 0, 0
    for r, e in zip(rows, esc):
        acc_raw += len(r)
        acc_esc += len(r) + e
        # the escaped prefix up to this boundary must unescape back to the
        # raw prefix (what a WPP decoder does per substream)
        assert escaped[:acc_esc] == ebsp_escape(payload[:acc_raw]), (rows, esc)
    assert acc_esc == len(escaped)


def test_no_escapes():
    _check([b"\x45\x11", b"\x80\x80", b"\xff"])


def test_escape_inside_row():
    _check([b"\x45\x00\x00\x00\x11", b"\x80"])
    _check([b"\x45", b"\x00\x00\x01\x80", b"\x90"])


def test_escape_at_row_end():
    # rows produced by the CABAC coder end with a nonzero alignment byte,
    # but the counter must still be robust to zero tails
    _check([b"\x45\x00\x00\x00", b"\x02\x80"])


def test_many_rows_random():
    rng = np.random.RandomState(3)
    for _ in range(50):
        rows = []
        for _ in range(rng.randint(1, 6)):
            n = rng.randint(1, 30)
            # bias toward zeros to force escapes
            data = rng.choice([0, 0, 0, 1, 2, 3, 0x45, 0x80], size=n)
            rows.append(bytes(data.astype(np.uint8).tolist()) + b"\x81")
        _check(rows)


def test_wpp_stream_with_forced_escapes(tmp_path, rng):
    """End-to-end: a WPP encode whose payload contains escape sequences
    still decodes bit-exactly (FFmpeg parses the entry points)."""
    from conftest import decode_annexb, make_yuv
    from homerhevc_tpu.api import Encoder
    from homerhevc_tpu.config import EncoderConfig
    from homerhevc_tpu.hevc.bitstream import annex_b

    cfg = EncoderConfig(width=128, height=96, qp=12, gop_size=0, sao=False,
                        deblocking=False, sign_hiding=False, cu_size=32,
                        wpp=True)
    enc = Encoder(cfg)
    frames = [make_yuv(rng, 128, 96) for _ in range(3)]
    nals, recons = [], []
    for f in frames:
        for ef in enc.encode(*f):
            nals.extend(ef.nals)
            recons.append(ef.recon["y"])
    for ef in enc.flush():
        nals.extend(ef.nals)
        recons.append(ef.recon["y"])
    p = tmp_path / "wpp_esc.265"
    p.write_bytes(annex_b(nals))
    dec = decode_annexb(p)
    assert len(dec) == len(recons)
    for d, r in zip(dec, recons):
        assert np.array_equal(d, r)
