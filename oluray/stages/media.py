"""Audio / video stages over opaque binary columns with typed
metadata — the multimodal pipeline shapes a 100 TB training-data run
needs (decode-bound actor pools, small batches for multi-MB payloads,
frame explosion without re-shipping the container).

Mirrors the image-stage contract (`oluray/stages/image.py`): codecs
bound once per actor in `__init__`, payload bytes never used as a
shuffle key, small `batch_size` chosen by the caller because each row
can be megabytes. Audio decode is REAL (WAV PCM16); the video
container is the documented stand-in (`functions/mediacodec.py`) with
real probe/index/slice plumbing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from oluray.functions import mediacodec


class AudioFeatures:
    """(audio_id, bytes) -> per-clip features: sample rate, length,
    duration, RMS level, zero-crossing rate, clipping fraction. All
    feature math is vectorized numpy over the decoded sample array."""

    def __init__(self, id_col: str = "audio_id", bytes_col: str = "bytes"):
        self.id_col, self.bytes_col = id_col, bytes_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        rates, counts, durs, rms, zcr, clip = [], [], [], [], [], []
        for buf in batch[self.bytes_col].to_pylist():
            rate, s = mediacodec.decode_wav(buf)
            x = s.astype(np.float64) / 32768.0
            n = len(x)
            rates.append(rate)
            counts.append(n)
            durs.append(n / rate if rate else 0.0)
            rms.append(float(np.sqrt(np.mean(x * x))) if n else 0.0)
            zcr.append(
                float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                if n > 1 else 0.0
            )
            clip.append(float(np.mean(np.abs(s) >= 32767)) if n else 0.0)
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "sample_rate": pa.array(rates, pa.int32()),
                "n_samples": pa.array(counts, pa.int64()),
                "duration_s": pa.array(np.round(durs, 6), pa.float64()),
                "rms": pa.array(np.round(rms, 6), pa.float64()),
                "zcr": pa.array(np.round(zcr, 6), pa.float64()),
                "clip_frac": pa.array(np.round(clip, 6), pa.float64()),
            }
        )


class FrameSample:
    """(video_id, bytes) -> one row per SAMPLED frame:
    (video_id, frame_idx, ts_ms, frame_bytes). Uniform stride
    sampling: `every` (take every k-th frame) or `n_frames` (exactly
    n uniformly spaced). The container is probed once per row and
    frames are SLICED out — the unsampled majority of the payload is
    never decoded or re-emitted, which is the point at 100 TB."""

    def __init__(self, every: int | None = None, n_frames: int | None = None,
                 id_col: str = "video_id", bytes_col: str = "bytes"):
        if (every is None) == (n_frames is None):
            raise ValueError("pass exactly one of `every` / `n_frames`")
        self.every, self.n = every, n_frames
        self.id_col, self.bytes_col = id_col, bytes_col

    def _indices(self, total: int) -> np.ndarray:
        if self.every is not None:
            return np.arange(0, total, self.every, dtype=np.int64)
        k = min(self.n, total)
        if k <= 0:
            return np.array([], dtype=np.int64)
        # uniform positions incl. first frame, deterministic
        return np.unique((np.arange(k) * total // k).astype(np.int64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_idx, out_ts, out_bytes = [], [], [], []
        for vid, buf in zip(
            batch[self.id_col].to_pylist(), batch[self.bytes_col].to_pylist()
        ):
            n, fps, offs = mediacodec.probe_fakevideo(buf)
            for i in self._indices(n):
                out_id.append(vid)
                out_idx.append(int(i))
                out_ts.append(int(i * 1000 / fps) if fps else 0)
                out_bytes.append(buf[offs[i] : offs[i + 1]])
        return pa.table(
            {
                self.id_col: pa.array(out_id),
                "frame_idx": pa.array(out_idx, pa.int64()),
                "ts_ms": pa.array(out_ts, pa.int64()),
                "frame_bytes": pa.array(out_bytes, pa.binary()),
            }
        )
