"""Brute-force checks for tiled-raster blob labeling
(`raster.blob_labels`): hand-built masks whose blobs cross tile
borders in every direction (including a 4-tile corner crossing and a
C-shape that merges only THROUGH a neighbor tile), plus the
nation-disc catalog query vs a whole-raster BFS labeling."""
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from oluray.stages import raster


def _brute_blobs(mask: np.ndarray) -> pd.DataFrame:
    """Whole-raster 4-connected BFS labeling (pure Python)."""
    h, w = mask.shape
    seen = np.zeros_like(mask, dtype=bool)
    rows = []
    for y in range(h):
        for x in range(w):
            if not mask[y, x] or seen[y, x]:
                continue
            stack = [(y, x)]
            seen[y, x] = True
            px = []
            while stack:
                cy, cx = stack.pop()
                px.append((cy, cx))
                for ny, nx in ((cy - 1, cx), (cy + 1, cx),
                               (cy, cx - 1), (cy, cx + 1)):
                    if (0 <= ny < h and 0 <= nx < w and mask[ny, nx]
                            and not seen[ny, nx]):
                        seen[ny, nx] = True
                        stack.append((ny, nx))
            ys = np.array([p[0] for p in px])
            xs = np.array([p[1] for p in px])
            gid = ys * w + xs
            rows.append((int(gid.min()), len(px), int(xs.min()),
                         int(ys.min()), int(xs.max()), int(ys.max())))
    return (pd.DataFrame(rows, columns=["blob_id", "area", "x_min",
                                        "y_min", "x_max", "y_max"])
            .astype("int64"))


def _tiles_from_raster(mask: np.ndarray, tile: int) -> ray.data.Dataset:
    h, w = mask.shape
    assert h % tile == 0 and w % tile == 0
    items = []
    for ty in range(h // tile):
        for tx in range(w // tile):
            sub = mask[ty * tile:(ty + 1) * tile,
                       tx * tile:(tx + 1) * tile]
            items.append({"tx": tx, "ty": ty,
                          "mask": sub.ravel().astype(np.uint8).tolist()})
    return ray.data.from_items(items)


def _run(mask: np.ndarray, tile: int, grid_w: int) -> pd.DataFrame:
    out = raster.blob_labels(_tiles_from_raster(mask, tile),
                             tile, tile, grid_w,
                             num_partitions=4).to_pandas()
    return (out.astype("int64").sort_values("blob_id")
            .reset_index(drop=True))


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("blob_id").reset_index(drop=True)


def test_blobs_cross_tile_shapes(ray_session):
    # 16x16 raster, 4x4 tiles of 4px: a plus crossing a 4-tile
    # corner, a C-shape whose arms merge only through the right
    # tile column, an isolated pixel, and a full tile-row bar
    m = np.zeros((16, 16), dtype=bool)
    m[2:6, 3] = True   # vertical arm crossing y=3|4 tile border
    m[3, 1:6] = True   # horizontal arm crossing x=3|4 border
    # C-shape: top arm y=8, bottom arm y=11, spine x=9 (all in the
    # middle tile column); arms reach left into the previous tile
    m[8, 5:10] = True
    m[11, 5:10] = True
    m[8:12, 9] = True
    m[14, 14] = True   # singleton
    m[0, 8:16] = True  # bar across two tiles
    got = _run(m, 4, 4)
    exp = _norm(_brute_blobs(m))
    assert got.equals(exp)
    assert len(exp) == 4


def test_blobs_random_raster(ray_session):
    rng = np.random.default_rng(3)
    # dense-ish noise: many blobs, lots of border merges
    m = rng.random((24, 32)) < 0.45
    got = _run(m, 8, 4)
    exp = _norm(_brute_blobs(m))
    assert got.equals(exp)


def test_raster_blobs_query_matches_brute(ray_session):
    from oluray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    discs = Q._raster_discs(sf)
    w = Q.RAST_GW * Q.RAST_TILE
    h = Q.RAST_GH * Q.RAST_TILE
    yy, xx = np.mgrid[0:h, 0:w]
    m = np.zeros((h, w), dtype=bool)
    for cx, cy, r in discs:
        m |= (xx - cx) ** 2 + (yy - cy) ** 2 <= r * r
    exp = _norm(_brute_blobs(m))
    got = (Q.q_raster_blobs(sf).to_pandas().astype("int64")
           .sort_values("blob_id").reset_index(drop=True))
    assert got.equals(exp)
    assert len(exp) > 3  # discs actually form several merged blobs
