"""Audio / video byte-level codecs for the multimodal columns.

Audio is REAL: a RIFF/WAVE PCM16 reader+writer (pure struct/numpy —
the format is trivial and needs no external lib), so the audio
feature stage decodes genuine WAV bytes.

Video is a STAND-IN container ("FVID"): this environment has no video
codec library, so frames are stored as independently-encoded images
(the repo's own PNG / fake-jpeg codecs) behind a real length-indexed
container — magic, fps, frame count, offset table, frame blobs. The
container parsing, frame indexing and byte-slicing are real and what
the Ray stages exercise; ONLY the underlying frame pixel codec is the
deterministic stand-in (`oluray/functions/imagecodec.py`). On a real
deployment the `FVID` branch is replaced by an ffmpeg/PyAV-backed
probe+extract with the same function signatures.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# WAV PCM16 (real)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """mono int16 samples -> RIFF/WAVE PCM16 bytes."""
    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav(buf: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 bytes -> (sample_rate, mono int16 samples).
    Walks the chunk list properly (tolerates extra chunks); raises
    ValueError on non-PCM16 or malformed input."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE buffer")
    pos, rate, n_channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                # truncated fmt chunk must raise the documented
                # ValueError, not struct.error, so quarantining
                # callers can catch it
                raise ValueError("truncated WAV fmt chunk")
            audio_fmt, n_channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if audio_fmt != 1:
                raise ValueError(f"unsupported WAV format code {audio_fmt}")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if bits != 16 or n_channels != 1:
        raise ValueError(f"only mono PCM16 supported (got {n_channels}ch/{bits}bit)")
    return rate, np.frombuffer(data, dtype="<i2")


# ---------------------------------------------------------------------------
# FVID frame container (stand-in for a real video codec)
# ---------------------------------------------------------------------------

_FVID_MAGIC = b"FVID"


def encode_fakevideo(frames: list[bytes], fps: int = 10) -> bytes:
    """frame blobs -> length-indexed container: magic | fps(u16) |
    n(u32) | n x offset(u64) | blobs. Offsets are absolute so a
    reader can slice any frame without scanning."""
    head_len = 4 + 2 + 4 + 8 * len(frames)
    offs, pos = [], head_len
    for f in frames:
        offs.append(pos)
        pos += len(f)
    return b"".join(
        [_FVID_MAGIC, struct.pack("<H", fps), struct.pack("<I", len(frames))]
        + [struct.pack("<Q", o) for o in offs]
        + list(frames)
    )


def probe_fakevideo(buf: bytes) -> tuple[int, int, np.ndarray]:
    """-> (n_frames, fps, offsets[n+1]) without touching frame bytes
    (the metadata-only read a real probe would do)."""
    if len(buf) < 10 or buf[:4] != _FVID_MAGIC:
        raise ValueError("not an FVID buffer")
    (fps,) = struct.unpack("<H", buf[4:6])
    (n,) = struct.unpack("<I", buf[6:10])
    if len(buf) < 10 + 8 * n:
        raise ValueError("truncated FVID offset table")
    offs = np.frombuffer(buf, dtype="<u8", count=n, offset=10)
    return n, fps, np.append(offs, len(buf)).astype(np.int64)


def extract_frame(buf: bytes, idx: int) -> bytes:
    """One frame's encoded bytes by index (pure slicing, no decode)."""
    n, _, offs = probe_fakevideo(buf)
    if not 0 <= idx < n:
        raise IndexError(f"frame {idx} out of range (n={n})")
    return buf[offs[idx] : offs[idx + 1]]
