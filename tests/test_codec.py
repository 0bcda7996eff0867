"""Image codec round-trips + PSNR gate (north-rule per-row invariant)."""

import numpy as np
import pytest

from oluray.functions import imagecodec as ic
from oluray.sources import fixtures


def test_png_roundtrip_exact():
    for i, (w, h) in enumerate([(32, 32), (64, 48), (1, 1), (5, 3)]):
        px = fixtures._pixels(i, w, h, 42)
        out = ic.decode_png(ic.encode_png(px))
        np.testing.assert_array_equal(out, px)


def test_png_decodes_all_filter_types():
    # hand-build an image, encode with filter 0, then re-filter rows
    # manually for types 1 (Sub) and 2 (Up) and check the decoder
    import struct
    import zlib

    px = fixtures._pixels(9, 8, 4, 1)
    h, w, _ = px.shape
    raw = np.zeros((h, w * 3 + 1), dtype=np.uint8)
    flat = px.reshape(h, w * 3).astype(np.int32)
    for r in range(h):
        if r == 0:
            raw[r, 0] = 1  # Sub
            line = flat[r].copy()
            line[3:] = (flat[r, 3:] - flat[r, :-3]) & 0xFF
            raw[r, 1:] = line
        else:
            raw[r, 0] = 2  # Up
            raw[r, 1:] = (flat[r] - flat[r - 1]) & 0xFF
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + ic._chunk(b"IHDR", ihdr)
        + ic._chunk(b"IDAT", zlib.compress(raw.tobytes()))
        + ic._chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(ic.decode_png(data), px)


def test_fake_jpeg_lossy_psnr_gate():
    px = fixtures._pixels(2, 64, 64, 42)
    dec = ic.decode_fake_jpeg(ic.encode_fake_jpeg(px))
    p = ic.psnr_db(px, dec)
    assert 40.0 <= p < 60.0  # lossy, above the 40 dB gate
    assert not np.array_equal(dec, px)


def test_unknown_format_raises():
    with pytest.raises(NotImplementedError):
        ic.encode(np.zeros((2, 2, 3), np.uint8), "webp")


def test_psnr_identical_is_inf():
    px = fixtures._pixels(0, 16, 16, 0)
    assert ic.psnr_db(px, px) == float("inf")
