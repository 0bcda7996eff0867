"""Wave-21 catalog: Chebyshev distance transform, morphological
erosion, and per-image histogram entropy.

`distance_transform` is the proximity-analysis raster primitive
(buffer distance, nearest-facility fields): every grid cell's
chessboard (L-inf) distance to the nearest occupied event cell.
The engine runs the iterative 8-neighbor relaxation (d = min(d,
shift(d)+1) until fixpoint — at most grid-width rounds, each a
vectorized roll-min) on the aggregate-sized raster in one task; the
oracle brute-forces min(GREATEST(|dx|,|dy|)) over the occupied set.

`cell_erode` is binary morphological erosion (the shrink / noise
filter dual of wave-18's `cell_dilate`): occupied cells whose FULL
3x3 neighborhood is occupied (off-grid treated unoccupied, so edge
cells never survive — border-0 convention). Computed from the same
aggregate-bounded scatter as dilation: survivor = occupied cell
receiving donations from all 9 of its neighbors.

`image_entropy` is the per-image information measure behind
compressibility and quality screens: Shannon entropy of the 766-bin
gray histogram in scaled fixed-point (entropy_1e9), plus the exact
distinct-level count. Decode-local actor stage; rows-only (pixel
decode is not SQL), brute-verified in pytest.
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from oluray.functions import geo
from oluray.stages import joins


# ---------------------------------------------------------------------------
# distance_transform — chessboard distance to nearest occupied cell
# ---------------------------------------------------------------------------

DT_RES = 5  # 32 x 32


def _dt_relax(df: pd.DataFrame) -> pd.DataFrame:
    """Single-task chessboard distance transform over the aggregate
    raster: iterative 8-neighbor relaxation to fixpoint (exact —
    chessboard balls are squares, so each round extends the correct
    frontier by 1)."""
    n_grid = 1 << DT_RES
    INF = np.int64(1 << 30)
    d = np.full((n_grid, n_grid), INF, dtype=np.int64)
    if len(df):
        _, x, y = geo.cell_decode(df["cell"].to_numpy(np.int64))
        d[y, x] = 0
    while True:
        nd = d.copy()
        # 8 shifted copies, edge-padded with INF (no wrap)
        p = np.pad(d, 1, constant_values=INF)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                np.minimum(nd, p[1 + dy: 1 + dy + n_grid,
                                 1 + dx: 1 + dx + n_grid] + 1, out=nd)
        if (nd == d).all():
            break
        d = nd
    ys, xs = np.divmod(np.arange(n_grid * n_grid), n_grid)
    cells = (np.int64(DT_RES) * np.int64(geo.RES_SHIFT)
             + ys.astype(np.int64) * np.int64(geo.Y_SHIFT)
             + xs.astype(np.int64))
    return pd.DataFrame({"cell": cells,
                         "dist": d[ys, xs].astype("int64")})


def q_distance_transform(sf_dir: str):
    """(cell, dist) for every grid cell at res 5: chessboard distance
    to the nearest event-occupied cell. Corpus passes once through
    the occupied-cell combiner; the relaxation runs on the
    4^res-bounded raster (beyond one worker the same relaxation runs
    as a `bfs_hops`-shaped frontier exchange over cell blocks)."""
    from oluray.pipelines.queries_wave18 import _event_cell_counts

    counts = _event_cell_counts(sf_dir, DT_RES)
    return counts.repartition(1).map_batches(
        _dt_relax, batch_format="pandas", batch_size=None)


def _dt_sql() -> str:
    lon, lat = geo.derive_lonlat_sql("event_id")
    x, y = geo.cell_xy_sql(lon, lat, DT_RES)
    n = 1 << DT_RES
    return f"""
    WITH occ AS (
      SELECT DISTINCT x, y
      FROM (SELECT {x} AS x, {y} AS y FROM events)),
    grid AS (
      SELECT gx.range AS x, gy.range AS y
      FROM range(0, {n}) gx(range), range(0, {n}) gy(range))
    SELECT ({DT_RES} * {geo.RES_SHIFT} + grid.y * {geo.Y_SHIFT}
            + grid.x) AS cell,
           (SELECT MIN(GREATEST(abs(grid.x - occ.x),
                                abs(grid.y - occ.y)))
            FROM occ)::BIGINT AS dist
    FROM grid
    """


# ---------------------------------------------------------------------------
# cell_erode — binary morphological erosion (border-0)
# ---------------------------------------------------------------------------

ERODE_RES = 5


def q_cell_erode(sf_dir: str):
    """Occupied event cells whose full 3x3 neighborhood is occupied.
    Built from the dilation scatter: an occupied target surviving
    erosion receives a donation from every one of its 9 neighbors
    (off-grid neighbors can't donate -> border-0). Aggregate-bounded
    throughout; output (cell,)."""
    from oluray.pipelines.queries_wave18 import _event_cell_counts

    counts = _event_cell_counts(sf_dir, ERODE_RES)

    def scatter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"cell": pa.array([], pa.int64())})
        _, x, y = geo.cell_decode(
            t["cell"].to_numpy(zero_copy_only=False).astype(np.int64))
        txs, tys = [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                txs.append(x + dx)
                tys.append(y + dy)
        tx = np.concatenate(txs)
        ty = np.concatenate(tys)
        tcell = (np.int64(ERODE_RES) * np.int64(geo.RES_SHIFT)
                 + ty * np.int64(geo.Y_SHIFT) + tx)
        return pa.table({"cell": pa.array(tcell)})

    def nine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cell", as_index=False).size()
        g = g[g["size"] == 9][["cell"]]
        g["cell"] = g["cell"].astype("int64")
        return g

    # off-grid donation targets never collide with occupied ids (the
    # semi-join below drops them), so no clip is needed before the
    # 9-count
    scat = counts.map_batches(scatter, batch_format="pyarrow")
    full = joins.grouped_agg(scat, ["cell"], nine, num_partitions=8,
                             pre_repartition=False)
    return joins.semi_join(full, counts, "cell", num_partitions=8)


def _erode_sql() -> str:
    lon, lat = geo.derive_lonlat_sql("event_id")
    x, y = geo.cell_xy_sql(lon, lat, ERODE_RES)
    return f"""
    WITH occ AS (
      SELECT DISTINCT x, y
      FROM (SELECT {x} AS x, {y} AS y FROM events)),
    k AS (
      SELECT a.x, a.y, count(*) AS nn
      FROM occ a JOIN occ b
        ON abs(a.x - b.x) <= 1 AND abs(a.y - b.y) <= 1
      GROUP BY a.x, a.y)
    SELECT ({ERODE_RES} * {geo.RES_SHIFT} + y * {geo.Y_SHIFT} + x)
             AS cell
    FROM k WHERE nn = 9
    """


# ---------------------------------------------------------------------------
# image_entropy — per-image gray-histogram Shannon entropy
# ---------------------------------------------------------------------------


class EntropyStage:
    """Actor-pool stage: decode once, 766-bin gray histogram, Shannon
    entropy H = log2(W) - (1/W) * sum h*log2(h) in bits, scaled 1e9."""

    def __init__(self):
        from oluray.functions import imagecodec

        self.decode = imagecodec.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("image_id", "entropy_1e9", "n_levels")}
        for iid, blob, fmt in zip(batch["image_id"].to_pylist(),
                                  batch["bytes"].to_pylist(),
                                  batch["fmt"].to_pylist()):
            gray = self.decode(blob, fmt).astype(np.int64).sum(axis=2)
            hist = np.bincount(gray.ravel(), minlength=766)[:766]
            h = hist[hist > 0].astype(np.float64)
            w = h.sum()
            ent = np.log2(w) - float((h * np.log2(h)).sum()) / w
            out["image_id"].append(iid)
            out["entropy_1e9"].append(int(np.round(ent * 1e9)))
            out["n_levels"].append(int((hist > 0).sum()))
        return pa.table({
            "image_id": pa.array(out["image_id"]),
            "entropy_1e9": pa.array(out["entropy_1e9"], pa.int64()),
            "n_levels": pa.array(out["n_levels"], pa.int64())})


def q_image_entropy(sf_dir: str):
    """Per-image entropy + distinct-level count. Decode-local;
    rows-only; brute-verified in pytest."""
    from oluray.pipelines.queries import _synth_images

    images = _synth_images(sf_dir)
    return images.map_batches(EntropyStage, batch_format="pyarrow",
                              batch_size=256, concurrency=(1, 4))


QUERIES = {
    "distance_transform": q_distance_transform,
    "cell_erode": q_cell_erode,
    "image_entropy": q_image_entropy,
}

ORACLE = {
    "distance_transform": _dt_sql(),
    "cell_erode": _erode_sql(),
}
