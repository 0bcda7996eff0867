"""Wave-13 catalog: polyline rasterization (track -> cells) and
median-cut palette extraction.

`track_cells` is the LINE member of the raster<->vector north-rule
contract: points have `cell_encode`, polygons have `tile_cover` /
area cover, and tracks get sampled-segment rasterization here — which
grid cells does each user's trajectory touch, and how densely.
`palette_colors` extends the image family (decode / phash / quality /
channel stats) with the classic color-quantization pass. Registered
by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from oluray.functions import geo
from oluray.stages import joins


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# track_cells — sampled polyline rasterization onto the cell grid
# ---------------------------------------------------------------------------

TC_RES = 6  # 64 x 64 grid
TC_SAMPLES = 64  # samples per segment (incl. both endpoints)


def q_track_cells(sf_dir: str):
    """Track rasterization: every consecutive point pair of a user's
    trajectory is sampled at 64 evenly-spaced parameters and each
    sample lands in a grid cell; output is the per-(user, cell)
    sample density — the LINE leg of the raster<->vector contract
    (points: `cell_encode`; polygons: `tile_cover`; lines: here).
    Sampling (not exact supercover) is the deliberate trade that
    keeps the kernel one vectorized lerp + floor, bit-reproducible in
    SQL via `generate_series` with the identical float op order; at
    64 samples on a 64x64 grid no cell a segment crosses for more
    than ~1.6% of its length is missed. Segment formation is a
    per-user partition sort + shift (no self-join); the sample
    explosion is map-side (x64) straight into the count combiner."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    n = 1 << TC_RES
    base_id = TC_RES * geo.RES_SHIFT

    def pts(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon, lat = geo.derive_lonlat(eid)
        return pa.table({
            "event_id": pa.array(eid),
            "user_id": pa.array(t["user_id"].to_numpy(
                zero_copy_only=False).astype(np.int64)),
            "tus": pa.array(t["ts"].to_pandas()
                            .astype("datetime64[us]").astype("int64")
                            .to_numpy()),
            "lon": pa.array(lon), "lat": pa.array(lat)})

    p = ev.map_batches(pts, batch_format="pyarrow")

    def rasterize(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "cell": pd.Series([], dtype="int64"),
            "n_samples": pd.Series([], dtype="int64")})
        if len(df) < 2:
            return empty
        df = df.sort_values(["user_id", "tus", "event_id"],
                            kind="mergesort").reset_index(drop=True)
        uid = df["user_id"].to_numpy(np.int64)
        x = df["lon"].to_numpy(np.float64)
        y = df["lat"].to_numpy(np.float64)
        seg = uid[1:] == uid[:-1]
        if not seg.any():
            return empty
        u0 = uid[:-1][seg]
        x0, x1 = x[:-1][seg], x[1:][seg]
        y0, y1 = y[:-1][seg], y[1:][seg]
        # t = i / (S-1.0): double division, mirrored in SQL
        t = (np.arange(TC_SAMPLES, dtype=np.float64)
             / float(TC_SAMPLES - 1))[None, :]
        sx = x0[:, None] + (x1 - x0)[:, None] * t
        sy = y0[:, None] + (y1 - y0)[:, None] * t
        gx = np.clip(np.floor((sx + 180.0) / 360.0 * float(n)),
                     0, n - 1).astype(np.int64)
        gy = np.clip(np.floor((sy + 90.0) / 180.0 * float(n)),
                     0, n - 1).astype(np.int64)
        cell = base_id + gy * geo.Y_SHIFT + gx
        out = pd.DataFrame({
            "user_id": np.repeat(u0, TC_SAMPLES),
            "cell": cell.ravel()})
        g = out.groupby(["user_id", "cell"], as_index=False).size()
        return g.rename(columns={"size": "n_samples"}).astype("int64")

    def csum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["user_id", "cell"],
                          as_index=False)["n_samples"].sum()

    raster = joins.partitioned_map(p, ["user_id"], rasterize,
                                   num_partitions=8)
    return joins.grouped_agg(raster, ["user_id", "cell"], csum,
                             num_partitions=8)


def _track_cells_sql() -> str:
    lon, lat = geo.derive_lonlat_sql("event_id")
    n = 1 << TC_RES
    s = TC_SAMPLES
    return f"""
WITH p AS (
  SELECT user_id, ts, event_id, {lon} AS x, {lat} AS y FROM events),
seg AS (
  SELECT user_id,
         lag(x) OVER w AS x0, lag(y) OVER w AS y0, x AS x1, y AS y1,
         lag(user_id) OVER (ORDER BY user_id, ts, event_id) AS prev_u
  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sam AS (
  SELECT user_id,
         x0 + (x1 - x0) * (i / {float(s - 1)!r}) AS sx,
         y0 + (y1 - y0) * (i / {float(s - 1)!r}) AS sy
  FROM seg, unnest(generate_series(0, {s - 1})) AS t(i)
  WHERE x0 IS NOT NULL),
c AS (
  SELECT user_id,
         ({TC_RES} * {geo.RES_SHIFT}
          + LEAST(GREATEST(floor((sy + 90.0) / 180.0 * {float(n)!r})
                           ::BIGINT, 0), {n - 1}) * {geo.Y_SHIFT}
          + LEAST(GREATEST(floor((sx + 180.0) / 360.0 * {float(n)!r})
                           ::BIGINT, 0), {n - 1})) AS cell
  FROM sam)
SELECT user_id, cell, count(*)::BIGINT AS n_samples
FROM c GROUP BY user_id, cell
"""


# ---------------------------------------------------------------------------
# palette_colors — median-cut color quantization per image (rows-only)
# ---------------------------------------------------------------------------

PAL_K = 4  # 2 median-cut levels


class PaletteExtract:
    """Actor-pool stage: decode once per image, median-cut the pixel
    cloud into 4 boxes (split the widest-range channel at its median,
    twice), emit each box's mean color + pixel count. Codec table
    resolved once per actor (the stateful-stage contract)."""

    def __init__(self):
        from oluray.functions import imagecodec

        self.decode = imagecodec.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        ids = batch["image_id"].to_pylist()
        out_id, out_rank = [], []
        out_rgb = [[], [], []]
        out_n = []
        for iid, blob, fmt in zip(ids, blobs, fmts):
            px = self.decode(blob, fmt).reshape(-1, 3).astype(np.int64)
            boxes = [px]
            for _ in range(2):  # 2 levels -> 4 boxes
                nxt = []
                for b in boxes:
                    rng = b.max(axis=0) - b.min(axis=0)
                    ch = int(np.argmax(rng))
                    med = int(np.median(b[:, ch]))
                    lo = b[b[:, ch] <= med]
                    hi = b[b[:, ch] > med]
                    if len(hi) == 0:  # degenerate: constant channel
                        nxt.append(b)
                    else:
                        nxt.extend((lo, hi))
                boxes = nxt
            cols = []
            for b in boxes:
                mean = np.floor(b.mean(axis=0) + 0.5).astype(np.int64)
                cols.append((len(b), mean))
            # rank by count desc then color asc: deterministic
            cols.sort(key=lambda c: (-c[0], tuple(c[1])))
            for rank, (cnt, mean) in enumerate(cols):
                out_id.append(iid)
                out_rank.append(rank)
                for ch in range(3):
                    out_rgb[ch].append(int(mean[ch]))
                out_n.append(int(cnt))
        return pa.table({
            "image_id": pa.array(out_id, pa.string()),
            "rank": pa.array(out_rank, pa.int64()),
            "r": pa.array(out_rgb[0], pa.int64()),
            "g": pa.array(out_rgb[1], pa.int64()),
            "b": pa.array(out_rgb[2], pa.int64()),
            "n_pixels": pa.array(out_n, pa.int64())})


def q_palette_colors(sf_dir: str):
    """Median-cut palette per image (the color-quantization classic):
    decode -> split the widest channel at its median, twice -> 4 boxes
    -> (rank, mean color, pixel count) rows. Bytes never leave the
    decode task; output is 4 tiny rows per image. Rows-only (pixel
    decode is not SQL); the pytest recomputes a sample image with an
    independent reference and asserts the partition invariants."""
    from oluray.pipelines.queries import _synth_images

    images = _synth_images(sf_dir)
    return images.map_batches(PaletteExtract, batch_format="pyarrow",
                              batch_size=256, concurrency=(1, 4))


QUERIES = {
    "track_cells": q_track_cells,
    "palette_colors": q_palette_colors,
}

ORACLE = {
    "track_cells": _track_cells_sql(),
}
