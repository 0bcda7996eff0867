"""Self-contained image codecs (no PIL/cv2 in this container).

The north rule's payload is an image+caption table with ``bytes``
holding encoded images and a per-row invariant of decoded-pixel
allclose (PSNR >= 40 dB for lossy formats). This module provides:

- a REAL pure-Python **PNG** codec (RGB8, zlib DEFLATE, filter types
  0-4 on decode, filter 0 on encode) — lossless, spec-conformant
  (tested against the PNG magic/chunk/CRC layout);
- a clearly-marked **deterministic fake lossy codec** registered under
  fmt="jpeg": real JPEG en/decoding is STUBBED (libs absent); instead
  pixels are quantized to 6 bits/channel and zlib-compressed, giving a
  true lossy round-trip with PSNR ~= 42.7 dB (>= the 40 dB gate) so
  the Ray-side plumbing (schema, batch size, actor pools, PSNR check)
  is real and tested. Swap `encode_fake_jpeg` for a real codec when
  one is available.

Vectorized: all pixel work is numpy; per-image Python overhead is one
zlib call + chunk assembly.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_FJPG_MAGIC = b"FJPG"  # fake-jpeg container magic


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """RGB8 (h, w, 3) uint8 -> PNG bytes (filter 0, zlib level 6)."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = px.shape
    if c != 3:
        raise ValueError("encode_png expects RGB (h, w, 3)")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    raw = np.empty((h, w * 3 + 1), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 (None) per scanline
    raw[:, 1:] = px.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return (
        _PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, w: int) -> np.ndarray:
    """Undo PNG scanline filters (types 0-4), bytes-per-pixel=3."""
    bpp = 3
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    for r in range(h):
        ftype = raw[r, 0]
        line = raw[r, 1:].astype(np.int32)
        prev = out[r - 1].astype(np.int32) if r > 0 else np.zeros(stride, dtype=np.int32)
        if ftype == 0:
            res = line
        elif ftype == 2:  # Up
            res = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left-to-right scan
            res = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                left = res[i - bpp] if i >= bpp else 0
                up = prev[i]
                ul = prev[i - bpp] if i >= bpp else 0
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) >> 1
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                res[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[r] = res.astype(np.uint8)
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> RGB8 (h, w, 3). Supports 8-bit RGB, filters 0-4."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            interlace = payload[12]
            if depth != 8 or ctype != 2:
                raise NotImplementedError("only 8-bit RGB PNGs supported")
            if interlace != 0:
                # Adam7 streams don't have the sequential scanline
                # layout assumed below — reject clearly instead of a
                # reshape error or silently scrambled pixels
                raise NotImplementedError("interlaced PNGs not supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w * 3 + 1)
    return _unfilter(raw, h, w).reshape(h, w, 3)


def encode_fake_jpeg(pixels: np.ndarray) -> bytes:
    """STUB for a real JPEG encoder (no image libs in container).

    Deterministic lossy codec: quantize to 6 bits/channel then zlib.
    Uniform quantization error in [0,3] => MSE ~= 3.5 => PSNR
    ~= 10*log10(255^2/3.5) ~= 42.7 dB, exercising the lossy
    (PSNR >= 40 dB) verification path for real.
    """
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    q = (px >> 2) << 2
    return _FJPG_MAGIC + struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 6)


def decode_fake_jpeg(data: bytes) -> np.ndarray:
    if data[:4] != _FJPG_MAGIC:
        raise ValueError("not a FJPG payload")
    w, h = struct.unpack(">II", data[4:12])
    return np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8).reshape(h, w, 3)


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "jpeg":
        return encode_fake_jpeg(pixels)
    raise NotImplementedError(f"format {fmt!r}: real codec not available in container")


def decode(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        return decode_fake_jpeg(data)
    raise NotImplementedError(f"format {fmt!r}: real codec not available in container")


def psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio between two uint8 images (dB)."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash: 8x8 block-mean of gray vs median."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    blocks = np.empty((8, 8))
    for r in range(8):
        for c in range(8):
            blocks[r, c] = gray[ys[r] : ys[r + 1], xs[c] : xs[c + 1]].mean()
    bits = (blocks > np.median(blocks)).ravel()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - 2**63 if val >= 2**63 else val  # int64 range


_FJQ_MAGIC = b"FJQ1"  # parameterized-quantization container magic


def encode_quantized(pixels: np.ndarray, bits: int) -> bytes:
    """Parameterized lossy stand-in: quantize to `bits` bits/channel
    then zlib — the rate/distortion knob `encode_fake_jpeg` fixes at
    6 bits. Uniform quantization step 2^(8-bits) gives a predictable
    PSNR ladder (7 -> ~48.1 dB, 6 -> ~42.7, 5 -> ~36.6, 4 -> ~30.7),
    so adaptive-recompression logic exercises a REAL accept/reject
    boundary around the 40 dB contract."""
    if not 1 <= bits <= 8:
        raise ValueError(f"bits must be in [1, 8], got {bits}")
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    shift = 8 - bits
    q = (px >> shift) << shift
    return (_FJQ_MAGIC + struct.pack(">IIB", w, h, bits)
            + zlib.compress(q.tobytes(), 6))


def decode_quantized(data: bytes) -> np.ndarray:
    if data[:4] != _FJQ_MAGIC:
        raise ValueError("not a FJQ payload")
    w, h, _bits = struct.unpack(">IIB", data[4:13])
    return np.frombuffer(
        zlib.decompress(data[13:]), dtype=np.uint8).reshape(h, w, 3)
