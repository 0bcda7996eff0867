"""Audio/video multimodal stages: WAV PCM16 codec roundtrip (real),
FVID container probe/slice (stand-in container, real plumbing), and
the Ray actor-pool stages over binary columns."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from oluray.functions import mediacodec as mc
from oluray.functions.imagecodec import encode
from oluray.sources import fixtures
from oluray.stages.media import AudioFeatures, FrameSample


def test_wav_roundtrip_and_chunk_walk():
    s = (10000 * np.sin(np.arange(800) / 7.0)).astype(np.int16)
    buf = mc.encode_wav(s, rate=8000)
    rate, out = mc.decode_wav(buf)
    assert rate == 8000
    np.testing.assert_array_equal(out, s)
    # extra chunk between fmt and data must be skipped, not break parse
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + np.uint32(4).tobytes() + b"info"
    buf2 = buf[:fmt_end] + extra + buf[fmt_end:]
    rate2, out2 = mc.decode_wav(buf2)
    assert rate2 == 8000
    np.testing.assert_array_equal(out2, s)
    with pytest.raises(ValueError):
        mc.decode_wav(b"nope" * 10)


def test_fvid_probe_and_slice():
    frames = [bytes([i]) * (10 + i) for i in range(5)]
    buf = mc.encode_fakevideo(frames, fps=25)
    n, fps, offs = mc.probe_fakevideo(buf)
    assert (n, fps) == (5, 25)
    for i, f in enumerate(frames):
        assert mc.extract_frame(buf, i) == f
    with pytest.raises(IndexError):
        mc.extract_frame(buf, 5)
    with pytest.raises(ValueError):
        mc.probe_fakevideo(b"XXXX" + buf[4:])


def test_audio_features_stage():
    loud = mc.encode_wav(np.full(1000, 32767, dtype=np.int16))
    quiet = mc.encode_wav(np.zeros(500, dtype=np.int16), rate=8000)
    ds = ray.data.from_arrow(
        pa.table(
            {"audio_id": pa.array([1, 2], pa.int64()),
             "bytes": pa.array([loud, quiet], pa.binary())}
        )
    )
    df = (
        ds.map_batches(AudioFeatures, batch_format="pyarrow", concurrency=1)
        .to_pandas().set_index("audio_id")
    )
    assert df.loc[1, "clip_frac"] == 1.0
    assert df.loc[1, "rms"] == pytest.approx(32767 / 32768, abs=1e-4)
    assert df.loc[2, "rms"] == 0.0
    assert df.loc[2, "duration_s"] == pytest.approx(500 / 8000)
    assert df.loc[2, "sample_rate"] == 8000


def test_frame_sample_stage():
    frames = [encode(fixtures._pixels(i, 8, 8, 42), "png") for i in range(10)]
    buf = mc.encode_fakevideo(frames, fps=10)
    ds = ray.data.from_arrow(
        pa.table(
            {"video_id": pa.array([7], pa.int64()),
             "bytes": pa.array([buf], pa.binary())}
        )
    )
    out = (
        ds.map_batches(
            FrameSample, fn_constructor_kwargs=dict(every=4),
            batch_format="pyarrow", concurrency=1,
        ).to_pandas().sort_values("frame_idx")
    )
    assert list(out["frame_idx"]) == [0, 4, 8]
    assert list(out["ts_ms"]) == [0, 400, 800]
    # sliced bytes are the exact original frame blobs
    for _, r in out.iterrows():
        assert bytes(r["frame_bytes"]) == frames[r["frame_idx"]]

    out2 = (
        ds.map_batches(
            FrameSample, fn_constructor_kwargs=dict(n_frames=3),
            batch_format="pyarrow", concurrency=1,
        ).to_pandas()
    )
    assert len(out2) == 3 and out2["frame_idx"].iloc[0] == 0
    with pytest.raises(ValueError):
        FrameSample()
    with pytest.raises(ValueError):
        FrameSample(every=2, n_frames=3)
