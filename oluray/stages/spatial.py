"""Spatial operators: cell encode, PIP join, kNN, tile cover.

The north rule's replacement for the reference's delegated geometry
step (`/root/reference/src/osm/Osm2ttl.cpp:38-109`): instead of
re-running osm2rdf on dummy-element XML, geometry work happens
in-engine as vectorized `map_batches` stages:

- `CellEncode` — point -> hierarchical cell id (stateless task).
- `PolygonIndexStage` — **actor pool**: each actor builds, ONCE in
  `__init__`, a cell -> candidate-polygon inverted index from the
  broadcast polygon table (`ray.put` once on the driver), then per
  batch does candidate lookup + exact ray-casting refine. This is the
  ST4 analog (prebuilt spatial index per worker) and the J1-J6
  closure re-expressed spatially: "which changed polygons affect this
  image footprint".
- `KnnStage` — actor pool holding a cell-bucketed feature index;
  k-ring expansion generates candidates, exact haversine refines.
  `knn_brute` is the small-side baseline (numpy broadcast matmul
  shape) used by the SQL oracle.
- `tile_cover` — raster->vector: each image's footprint bbox (scaled
  by decoded w x h) -> covering cell set, exploded to rows.

Partitioning assumption (documented per the build rules): polygons of
one changeset window fit comfortably in one broadcast object (the
reference's whole merged diff is held in ONE process heap,
`src/osm/OsmChangeHandler.cpp:56-72`); images stream. Dense-cell skew
is handled downstream by salted repartition (`oluray.stages.skew`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from oluray.functions import geo


def add_cell_column(
    ds: ray.data.Dataset, res: int, lon_col: str = "lon", lat_col: str = "lat",
    out_col: str = "cell",
) -> ray.data.Dataset:
    """Stateless vectorized cell encoding."""

    def fn(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        return batch.append_column(out_col, pa.array(geo.cell_encode(lon, lat, res)))

    return ds.map_batches(fn, batch_format="pyarrow")


def polygons_to_numpy(polys: pa.Table) -> list[dict]:
    """Materialize the (small) polygon table into plain numpy rings."""
    out = []
    for row in polys.to_pylist():
        ring = row["ring"]
        out.append(
            {
                "poly_id": row["poly_id"],
                "op": row["op"],
                "lon": np.array([v["lon"] for v in ring]),
                "lat": np.array([v["lat"] for v in ring]),
            }
        )
    return out


def build_polygon_index(polys: list[dict], res: int) -> dict:
    """cell id -> list of polygon indices whose cover includes it."""
    index: dict[int, list[int]] = {}
    for i, p in enumerate(polys):
        for c in geo.polygon_cover(p["lon"], p["lat"], res).tolist():
            index.setdefault(c, []).append(i)
    return index


class PolygonIndexStage:
    """Actor-pool PIP join: points x broadcast polygons.

    __init__ (once per actor): fetch polygons from the object store,
    build the cell->polygons inverted index. __call__ (per batch):
    cell-cover prefilter then exact ray-casting refine; emits one row
    per (point, containing polygon).
    """

    def __init__(self, polys_ref, res: int = 8, id_col: str = "image_id",
                 lon_col: str = "lon", lat_col: str = "lat",
                 carry_cols: tuple[str, ...] = ()):
        self.polys = ray.get(polys_ref)
        self.res = res
        self.id_col, self.lon_col, self.lat_col = id_col, lon_col, lat_col
        self.carry_cols = carry_cols
        self.index = build_polygon_index(self.polys, res)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        cells = geo.cell_encode(lon, lat, self.res)
        # group points by cell (one argsort), walk only the distinct
        # cells present — no per-row Python loop
        order = np.argsort(cells, kind="stable")
        sc = cells[order]
        uniq, starts = np.unique(sc, return_index=True)
        bounds = np.append(starts, len(sc))
        cand_points: dict[int, list[np.ndarray]] = {}
        for i, c in enumerate(uniq.tolist()):
            plist = self.index.get(c)
            if not plist:
                continue
            rows = order[bounds[i] : bounds[i + 1]]
            for pi in plist:
                cand_points.setdefault(pi, []).append(rows)
        out_rows: list[np.ndarray] = []
        out_poly: list[np.ndarray] = []
        for pi, row_chunks in cand_points.items():
            idx = np.concatenate(row_chunks)
            p = self.polys[pi]
            inside = geo.point_in_polygon(lon[idx], lat[idx], p["lon"], p["lat"])
            hit = idx[inside]
            if len(hit):
                out_rows.append(hit)
                out_poly.append(np.full(len(hit), pi, dtype=np.int64))
        if out_rows:
            rows_idx = np.concatenate(out_rows)
            poly_idx = np.concatenate(out_poly)
        else:
            rows_idx = np.array([], dtype=np.int64)
            poly_idx = np.array([], dtype=np.int64)
        cols = {
            self.id_col: pa.compute.take(batch[self.id_col], pa.array(rows_idx)),
            "poly_id": pa.array([self.polys[i]["poly_id"] for i in poly_idx], pa.int64()),
            "op": pa.array([self.polys[i]["op"] for i in poly_idx], pa.string()),
            "lon": pa.array(lon[rows_idx]),
            "lat": pa.array(lat[rows_idx]),
        }
        for c in self.carry_cols:
            cols[c] = pa.compute.take(batch[c], pa.array(rows_idx))
        return pa.table(cols)


def pip_join(
    points: ray.data.Dataset, polys: pa.Table, res: int = 8,
    id_col: str = "image_id", concurrency: int = 4, batch_size: int = 32768,
    carry_cols: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """points x polygons containment join (cell prefilter + exact PIP)."""
    polys_ref = ray.put(polygons_to_numpy(polys))
    return points.map_batches(
        PolygonIndexStage,
        fn_constructor_kwargs=dict(polys_ref=polys_ref, res=res, id_col=id_col,
                                   carry_cols=carry_cols),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )


# ---------------------------------------------------------------------------
# kNN
# ---------------------------------------------------------------------------


def knn_brute(
    lon: np.ndarray, lat: np.ndarray, feat_lon: np.ndarray, feat_lat: np.ndarray,
    k: int = 1,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact kNN by haversine against ALL features (small feature set,
    broadcast): returns (indices (n,k), dists (n,k)). Ties broken by
    lower feature index (stable argsort)."""
    n, m = len(lon), len(feat_lon)
    d = geo.haversine_m(
        np.repeat(lon, m), np.repeat(lat, m), np.tile(feat_lon, n), np.tile(feat_lat, n)
    ).reshape(n, m)
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return idx, np.take_along_axis(d, idx, axis=1)


_M_PER_DEG = np.pi * geo.EARTH_RADIUS_M / 180.0  # meters per degree of latitude


class KnnStage:
    """Actor-pool nearest-feature assignment (exact result).

    Features (id, lon, lat) are broadcast once; each actor builds a
    cell-bucketed inverted index in __init__ (the IVF-style scale
    path). Per batch, points are grouped by cell; per cell the search
    (1) expands a square ring until any candidate is found, (2) takes
    the k-th best distance found as radius d, (3) converts d into an
    exact (lat-ring, lon-ring) rectangle — lon ring widened by
    1/cos(lat) for meridian convergence — and re-gathers candidates in
    that rectangle, so no nearer feature can hide outside the search
    box. Brute force fallback for tiny feature sets / isolated points.
    """

    MAX_PROBE_RING = 64

    def __init__(self, feats_ref, res: int = 6, k: int = 1,
                 id_col: str = "image_id", lon_col: str = "lon", lat_col: str = "lat"):
        fid, flon, flat_ = ray.get(feats_ref)
        self.fid = np.asarray(fid, dtype=np.int64)
        self.flon = np.asarray(flon, dtype=np.float64)
        self.flat = np.asarray(flat_, dtype=np.float64)
        self.res, self.k = res, k
        self.id_col, self.lon_col, self.lat_col = id_col, lon_col, lat_col
        self.n_grid = 1 << res
        self.cell_h_m = (180.0 / self.n_grid) * _M_PER_DEG
        self.cell_w_deg = 360.0 / self.n_grid
        self.buckets: dict[int, np.ndarray] = {}
        cells = geo.cell_encode(self.flon, self.flat, res)
        order = np.argsort(cells, kind="stable")
        sorted_cells = cells[order]
        uniq, starts = np.unique(sorted_cells, return_index=True)
        bounds = np.append(starts, len(sorted_cells))
        for i, c in enumerate(uniq):
            self.buckets[int(c)] = order[bounds[i] : bounds[i + 1]]
        self.brute = len(self.fid) <= 64

    def _gather_rect(self, cx: int, cy: int, rx: int, ry: int) -> np.ndarray:
        """Feature indices in the cell rectangle |dx|<=rx (lon-wrapped),
        |dy|<=ry (lat-clamped) around (cx, cy)."""
        n = self.n_grid
        out = []
        y_lo, y_hi = max(0, cy - ry), min(n - 1, cy + ry)
        rx = min(rx, n // 2)
        for dy in range(y_lo, y_hi + 1):
            base = np.int64(self.res) * np.int64(geo.RES_SHIFT) + np.int64(dy) * np.int64(geo.Y_SHIFT)
            for dx in range(-rx, rx + 1):
                c = int(base + (cx + dx) % n)
                b = self.buckets.get(c)
                if b is not None:
                    out.append(b)
        if not out:
            return np.array([], dtype=np.int64)
        return np.unique(np.concatenate(out))

    def _knn_cell(self, cx: int, cy: int, lon: np.ndarray, lat: np.ndarray):
        """Exact kNN for all points sharing one cell."""
        # phase 1: expand square ring until any candidate appears
        cand = np.array([], dtype=np.int64)
        ring = 0
        while ring <= self.MAX_PROBE_RING:
            cand = self._gather_rect(cx, cy, ring, ring)
            if len(cand) >= self.k:
                break
            ring += 1
        if len(cand) < self.k:
            cand = np.arange(len(self.fid))  # isolated: brute force
        m = len(cand)
        npts = len(lon)
        d = geo.haversine_m(
            np.repeat(lon, m), np.repeat(lat, m),
            np.tile(self.flon[cand], npts), np.tile(self.flat[cand], npts),
        ).reshape(npts, m)
        kk = min(self.k, m)
        part = np.argsort(d, axis=1, kind="stable")[:, :kk]
        dbest = np.take_along_axis(d, part, axis=1)
        if m < len(self.fid):
            # phase 2: exactness rectangle from the worst k-th distance
            d_max = float(dbest[:, -1].max())
            ry = int(np.ceil(d_max / self.cell_h_m)) + 1
            lat_edge = min(89.0, abs(lat).max() + (ry + 1) * 180.0 / self.n_grid)
            cosl = max(np.cos(np.radians(lat_edge)), 0.02)
            rx = int(np.ceil(d_max / (self.cell_w_deg * _M_PER_DEG * cosl))) + 1
            if rx > ring or ry > ring:
                cand2 = self._gather_rect(cx, cy, rx, ry)
                if len(cand2) > m:
                    m2 = len(cand2)
                    d = geo.haversine_m(
                        np.repeat(lon, m2), np.repeat(lat, m2),
                        np.tile(self.flon[cand2], npts), np.tile(self.flat[cand2], npts),
                    ).reshape(npts, m2)
                    kk = min(self.k, m2)
                    part = np.argsort(d, axis=1, kind="stable")[:, :kk]
                    dbest = np.take_along_axis(d, part, axis=1)
                    cand = cand2
        return cand[part], dbest

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        n = len(lon)
        idx = np.empty((n, self.k), dtype=np.int64)
        dist = np.empty((n, self.k), dtype=np.float64)
        if self.brute:
            idx, dist = knn_brute(lon, lat, self.flon, self.flat, self.k)
        else:
            cells = geo.cell_encode(lon, lat, self.res)
            order = np.argsort(cells, kind="stable")
            sorted_cells = cells[order]
            uniq, starts = np.unique(sorted_cells, return_index=True)
            bounds = np.append(starts, n)
            for i, c in enumerate(uniq):
                pts = order[bounds[i] : bounds[i + 1]]
                _, cx, cy = geo.cell_decode(np.array([c]))
                fi, fd = self._knn_cell(int(cx[0]), int(cy[0]), lon[pts], lat[pts])
                idx[pts], dist[pts] = fi, fd
        reps = np.repeat(np.arange(n), self.k)
        return pa.table(
            {
                self.id_col: pa.compute.take(batch[self.id_col], pa.array(reps)),
                "feature_id": pa.array(self.fid[idx.ravel()]),
                "rank": pa.array(np.tile(np.arange(1, self.k + 1), n).astype(np.int64)),
                "dist_m": pa.array(np.round(dist.ravel(), 3)),
            }
        )


def knn_join(
    points: ray.data.Dataset, feature_ids, feat_lon, feat_lat, k: int = 1,
    res: int = 6, id_col: str = "image_id", concurrency: int = 4,
    batch_size: int = 32768,
) -> ray.data.Dataset:
    feats_ref = ray.put(
        (np.asarray(feature_ids, np.int64), np.asarray(feat_lon, np.float64),
         np.asarray(feat_lat, np.float64))
    )
    return points.map_batches(
        KnnStage,
        fn_constructor_kwargs=dict(feats_ref=feats_ref, res=res, k=k, id_col=id_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )


# ---------------------------------------------------------------------------
# raster <-> vector tile cover
# ---------------------------------------------------------------------------


def bbox_cells(
    lon: np.ndarray, lat: np.ndarray, halfw_deg: np.ndarray, halfh_deg: np.ndarray,
    res: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized bbox -> covering cell explosion.

    Returns (row_idx, cells): one entry per (input row, covered cell),
    computed with pure integer arithmetic — no per-row Python loop.
    """
    n = float(1 << res)
    x0 = np.clip(np.floor((lon - halfw_deg + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    x1 = np.clip(np.floor((lon + halfw_deg + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    y0 = np.clip(np.floor((lat - halfh_deg + 90.0) / 180.0 * n), 0, n - 1).astype(np.int64)
    y1 = np.clip(np.floor((lat + halfh_deg + 90.0) / 180.0 * n), 0, n - 1).astype(np.int64)
    nx = x1 - x0 + 1
    ny = y1 - y0 + 1
    counts = nx * ny
    total = int(counts.sum())
    row_idx = np.repeat(np.arange(len(lon)), counts)
    # local index within each row's (nx x ny) grid
    first = np.concatenate(([0], np.cumsum(counts)[:-1]))
    k = np.arange(total) - np.repeat(first, counts)
    nyr = ny[row_idx]
    dx = k // nyr
    dy = k % nyr
    cells = (
        np.int64(res) * np.int64(geo.RES_SHIFT)
        + (y0[row_idx] + dy) * np.int64(geo.Y_SHIFT)
        + (x0[row_idx] + dx)
    )
    return row_idx, cells


def tile_cover(
    ds: ray.data.Dataset, res: int, id_col: str = "image_id",
    lon_col: str = "lon", lat_col: str = "lat",
    w_col: str = "w", h_col: str = "h", deg_per_px: float = 1e-3,
) -> ray.data.Dataset:
    """Raster->vector: map each image footprint (bbox centered on its
    point, sized w x h pixels at `deg_per_px`) onto its covering cell
    set at `res`; one output row per (image, cell). Vectorized: cells
    are enumerated with integer range arithmetic, no per-cell PIP.
    """

    def fn(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        w = batch[w_col].to_numpy(zero_copy_only=False).astype(np.float64)
        h = batch[h_col].to_numpy(zero_copy_only=False).astype(np.float64)
        row_idx, cells = bbox_cells(
            lon, lat, w * deg_per_px / 2.0, h * deg_per_px / 2.0, res
        )
        return pa.table(
            {
                id_col: pa.compute.take(batch[id_col], pa.array(row_idx)),
                "cell": pa.array(cells),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
