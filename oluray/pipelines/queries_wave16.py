"""Wave-16 catalog: Ripley's K pair counts (multi-radius spatial
point-pattern statistic) and per-image quadtree encoding.

`ripley_k` is the canonical second-order point-pattern statistic
(clustering vs dispersion at multiple scales): the exact count of
unordered point pairs within each radius of a ladder. Built directly
on `spatial.distance_self_join` — grid blocking + one-sided ghost
replication, never all-pairs — so the engine-side cost scales with
pair density, not corpus squared; the radius ladder is applied as a
vectorized band-count over the (tiny) pair stream. Counts are exact
BIGINTs on the shared rounded-mm haversine, so the DuckDB oracle
compares integers.

`quadtree_encode` is the raster-compression classic (and the
per-image sibling of the map-wide `tile_pyramid`): recursively split
each image into quadrants until a block's gray range fits the
tolerance, emit leaf blocks with exact integer pixel sums. Bytes
never leave the decode task; output is (image_id, depth, y0, x0, h,
w, gray_sum, n_px) rows. Rows-only (pixel decode is not SQL);
brute-verified against an independent recursive reference in pytest.
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from oluray.functions import geo
from oluray.stages import joins, spatial


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# ripley_k — pair counts within a radius ladder
# ---------------------------------------------------------------------------

RIP_TYPE = "click"
RIP_RADII_MM = (100_000_000, 200_000_000, 400_000_000)  # 100/200/400 km


def q_ripley_k(sf_dir: str):
    """Ripley's K counts over the 'click' event points: exact pair
    counts within 100/200/400 km. One distance self-join at the max
    radius (grid-blocked, pairs form exactly once), then a vectorized
    <=3-band classification per pair block and a scalar-sized sum.
    Output (r_mm, n_pairs); the K normalization A/(n^2) is the
    caller's float step, kept off the exact path."""
    import pyarrow.compute as pc

    ev = _read(sf_dir, "events", ["event_id", "event_type"])

    def pts(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], RIP_TYPE))
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon, lat = geo.derive_lonlat(eid)
        return pa.table({"event_id": pa.array(eid),
                         "lon": pa.array(lon), "lat": pa.array(lat)})

    pairs = spatial.distance_self_join(
        ev.map_batches(pts, batch_format="pyarrow"),
        "event_id", RIP_RADII_MM[-1] / 1000.0, num_partitions=16)

    radii = np.array(RIP_RADII_MM, dtype=np.int64)

    def bands(t: pa.Table) -> pa.Table:
        d = t["dist_mm"].to_numpy(zero_copy_only=False)
        hit = d[:, None] < radii[None, :]
        return pa.table({"r_mm": pa.array(radii),
                         "n_pairs": pa.array(hit.sum(axis=0)
                                             .astype(np.int64))})

    def csum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("r_mm", as_index=False)["n_pairs"].sum()
        return g[g["n_pairs"] > 0]

    return joins.grouped_agg(
        pairs.map_batches(bands, batch_format="pyarrow"),
        ["r_mm"], csum, num_partitions=1, pre_repartition=False)


def _ripley_sql() -> str:
    lon, lat = geo.derive_lonlat_sql("event_id")
    hav = geo.haversine_sql("a.lon", "a.lat", "b.lon", "b.lat")
    rmax_m = RIP_RADII_MM[-1] / 1000.0
    vals = ", ".join(f"({r})" for r in RIP_RADII_MM)
    return f"""
WITH p AS (
  SELECT event_id AS k, {lon} AS lon, {lat} AS lat FROM events
  WHERE event_type = '{RIP_TYPE}'),
pairs AS (
  SELECT round({hav} * 1000.0)::BIGINT AS dist_mm
  FROM p a JOIN p b ON a.k < b.k
  WHERE {hav} < {rmax_m!r})
SELECT r_mm, count(*)::BIGINT AS n_pairs
FROM pairs, (VALUES {vals}) AS v(r_mm)
WHERE dist_mm < r_mm
GROUP BY r_mm
"""


# ---------------------------------------------------------------------------
# quadtree_encode — per-image adaptive quadrant split
# ---------------------------------------------------------------------------

QT_T = 120       # max gray range (0..765 scale) tolerated in a leaf
QT_MAX_DEPTH = 4


class QuadtreeEncode:
    """Actor-pool stage: decode once, split blocks whose gray range
    (max-min of r+g+b) exceeds QT_T into 4 quadrants (ceil/floor for
    odd sizes), down to QT_MAX_DEPTH; emit leaves with exact integer
    gray sums. Iterative frontier, vectorized per block via summed
    min/max — no per-pixel Python."""

    def __init__(self):
        from oluray.functions import imagecodec

        self.decode = imagecodec.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("image_id", "depth", "y0", "x0",
                               "h", "w", "gray_sum", "n_px")}
        for iid, blob, fmt in zip(batch["image_id"].to_pylist(),
                                  batch["bytes"].to_pylist(),
                                  batch["fmt"].to_pylist()):
            px = self.decode(blob, fmt).astype(np.int64)
            gray = px.sum(axis=2)
            H, W = gray.shape
            stack = [(0, 0, 0, H, W)]
            while stack:
                d, y0, x0, h, w = stack.pop()
                blk = gray[y0:y0 + h, x0:x0 + w]
                if (d < QT_MAX_DEPTH and min(h, w) > 1
                        and int(blk.max() - blk.min()) > QT_T):
                    h1, w1 = h // 2, w // 2
                    stack.extend([
                        (d + 1, y0, x0, h1, w1),
                        (d + 1, y0, x0 + w1, h1, w - w1),
                        (d + 1, y0 + h1, x0, h - h1, w1),
                        (d + 1, y0 + h1, x0 + w1, h - h1, w - w1)])
                else:
                    out["image_id"].append(iid)
                    out["depth"].append(d)
                    out["y0"].append(y0)
                    out["x0"].append(x0)
                    out["h"].append(h)
                    out["w"].append(w)
                    out["gray_sum"].append(int(blk.sum()))
                    out["n_px"].append(h * w)
        return pa.table({
            "image_id": pa.array(out["image_id"], pa.string()),
            "depth": pa.array(out["depth"], pa.int64()),
            "y0": pa.array(out["y0"], pa.int64()),
            "x0": pa.array(out["x0"], pa.int64()),
            "h": pa.array(out["h"], pa.int64()),
            "w": pa.array(out["w"], pa.int64()),
            "gray_sum": pa.array(out["gray_sum"], pa.int64()),
            "n_px": pa.array(out["n_px"], pa.int64())})


def q_quadtree_encode(sf_dir: str):
    """Quadtree leaf encoding per image: adaptive quadrant splits
    until a block's gray range fits QT_T (or depth/size bottoms out).
    Decode-local actor-pool stage; only leaf-block integer rows leave
    the task. Rows-only; brute-verified by an independent recursive
    reference in pytest."""
    from oluray.pipelines.queries import _synth_images

    images = _synth_images(sf_dir)
    return images.map_batches(QuadtreeEncode, batch_format="pyarrow",
                              batch_size=256, concurrency=(1, 4))


QUERIES = {
    "ripley_k": q_ripley_k,
    "quadtree_encode": q_quadtree_encode,
}

ORACLE = {
    "ripley_k": _ripley_sql(),
}
