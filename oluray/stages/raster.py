"""Tiled-raster operators: connected-component labeling (blob
extraction) with cross-tile merge.

The scale-shaped way to label blobs in a raster too big for any one
worker: pixels NEVER become rows (a 1-row-per-pixel explode — the
`grid_clusters` shape — is a 100x row blowup at raster scale).
Instead each tile stays a dense array inside one `map_batches` task:

1. LOCAL pass (per tile, embarrassingly parallel): every masked pixel
   starts labeled with its own global linear id; a vectorized 4-
   neighbor min-propagation runs to fixpoint inside the tile. Each
   tile then emits only (a) one summary row per LOCAL blob (min-gid
   label, area, bbox) and (b) one row per masked BORDER pixel keyed
   by the shared tile-edge id — O(blobs + perimeter) rows per tile,
   never O(pixels).
2. MERGE pass: border keys where BOTH sides are masked become label-
   label equivalence edges; `joins.connected_components` (frontier-
   contracting, driver sees only counts) resolves them; blob
   summaries are re-keyed through the label map (left join — blobs
   that touch no border keep their local label) and a grouped
   aggregate folds per-tile fragments into global blobs.

This mirrors the two-level union-find of classic out-of-core CCL
(the per-tile pass is min-propagation rather than scanline union-find
for vectorization; its cost is O(tile_area x tile_diameter) worst
case, bounded by the fixed tile size).

Output: one row per blob — (blob_id = min global pixel id in the
blob, area, x_min, y_min, x_max, y_max) in global pixel coordinates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _mask_2d(col, row_idx: int, w: int, h: int) -> np.ndarray:
    """Row `row_idx`'s mask as a (h, w) bool array, whatever list-like
    encoding the block uses."""
    from oluray.stages.spatial import _col_points

    flat, off = _col_points(col)
    seg = flat[off[row_idx]:off[row_idx + 1]]
    if len(seg) != w * h:
        raise ValueError(f"mask length {len(seg)} != {w}x{h}")
    return (seg != 0).reshape(h, w)


def _local_label(mask: np.ndarray, gid: np.ndarray) -> np.ndarray:
    """4-connected min-label propagation to fixpoint inside one tile.
    Unmasked pixels get -1."""
    lab = np.where(mask, gid, np.iinfo(np.int64).max)
    while True:
        new = lab.copy()
        new[1:, :] = np.minimum(new[1:, :], lab[:-1, :])
        new[:-1, :] = np.minimum(new[:-1, :], lab[1:, :])
        new[:, 1:] = np.minimum(new[:, 1:], lab[:, :-1])
        new[:, :-1] = np.minimum(new[:, :-1], lab[:, 1:])
        new = np.where(mask, new, np.iinfo(np.int64).max)
        if np.array_equal(new, lab):
            break
        lab = new
    return np.where(mask, lab, -1)


def blob_labels(
    tiles: ray.data.Dataset,
    tile_w: int,
    tile_h: int,
    grid_w: int,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Global blob summaries over a tiled binary raster.

    `tiles`: one row per tile — (tx int64, ty int64, mask
    list<int>/tensor of len tile_w*tile_h, row-major, nonzero =
    masked). Tiles absent from the dataset are all-zero. `grid_w` is
    the raster width in TILES (global pixel x = tx*tile_w + px; the
    linear gid stride is grid_w*tile_w).

    Returns Dataset (blob_id, area, x_min, y_min, x_max, y_max),
    one row per 4-connected component of the global mask; blob_id is
    the component's min global linear pixel id.

    Partitioning assumption: one tile fits one task's heap (fixed
    tile_w x tile_h); the exchange carries only per-blob summaries
    and border-pixel rows.
    """
    from oluray.stages import joins

    stride = grid_w * tile_w
    imax = np.iinfo(np.int64).max

    def emit(t: pa.Table) -> pa.Table:
        # unified emission: kind 0 = border (key, lab),
        # kind 1 = blob fragment (lab, area, bbox)
        keys, labs = [], []
        f_lab, f_area = [], []
        f_x0, f_y0, f_x1, f_y1 = [], [], [], []
        txs = t["tx"].to_numpy(zero_copy_only=False).astype(np.int64)
        tys = t["ty"].to_numpy(zero_copy_only=False).astype(np.int64)
        for r in range(t.num_rows):
            mask = _mask_2d(t["mask"], r, tile_w, tile_h)
            if not mask.any():
                continue
            gx0 = txs[r] * tile_w
            gy0 = tys[r] * tile_h
            gy, gx = np.mgrid[0:tile_h, 0:tile_w]
            gxg = gx + gx0
            gyg = gy + gy0
            gid = gyg * stride + gxg
            lab = _local_label(mask, gid)
            # blob fragments: vectorized per-label reduce
            m = mask.ravel()
            lf = lab.ravel()[m]
            xf = gxg.ravel()[m]
            yf = gyg.ravel()[m]
            order = np.argsort(lf, kind="mergesort")
            lo, xo, yo = lf[order], xf[order], yf[order]
            starts = np.flatnonzero(np.r_[True, lo[1:] != lo[:-1]])
            f_lab.append(lo[starts])
            f_area.append(np.diff(np.r_[starts, len(lo)]))
            f_x0.append(np.minimum.reduceat(xo, starts))
            f_x1.append(np.maximum.reduceat(xo, starts))
            f_y0.append(np.minimum.reduceat(yo, starts))
            f_y1.append(np.maximum.reduceat(yo, starts))
            # border rows: edge key = 2 * (gid of the lesser pixel)
            # + axis flag (0 = horizontal neighbor, 1 = vertical)
            right = mask[:, -1]
            if right.any():
                g = gid[right, -1]
                keys.append(g * 2); labs.append(lab[right, -1])
            left = mask[:, 0]
            if left.any() and txs[r] > 0:
                g = gid[left, 0] - 1
                keys.append(g * 2); labs.append(lab[left, 0])
            bot = mask[-1, :]
            if bot.any():
                g = gid[-1, bot]
                keys.append(g * 2 + 1); labs.append(lab[-1, bot])
            top = mask[0, :]
            if top.any() and tys[r] > 0:
                g = gid[0, top] - stride
                keys.append(g * 2 + 1); labs.append(lab[0, top])
        cat = (lambda xs, dt: np.concatenate(xs).astype(dt)
               if xs else np.empty(0, dt))
        kk = cat(keys, np.int64)
        kl = cat(labs, np.int64)
        bl = cat(f_lab, np.int64)
        return pa.table({
            "kind": pa.array(np.concatenate([
                np.zeros(len(kk), np.int8), np.ones(len(bl), np.int8)])),
            "key": pa.array(np.concatenate([kk, np.zeros(len(bl),
                                                         np.int64)])),
            "lab": pa.array(np.concatenate([kl, bl])),
            "area": pa.array(np.concatenate([
                np.zeros(len(kk), np.int64), cat(f_area, np.int64)])),
            "x_min": pa.array(np.concatenate([
                np.zeros(len(kk), np.int64), cat(f_x0, np.int64)])),
            "y_min": pa.array(np.concatenate([
                np.zeros(len(kk), np.int64), cat(f_y0, np.int64)])),
            "x_max": pa.array(np.concatenate([
                np.zeros(len(kk), np.int64), cat(f_x1, np.int64)])),
            "y_max": pa.array(np.concatenate([
                np.zeros(len(kk), np.int64), cat(f_y1, np.int64)])),
        })

    # O(blobs + perimeter) rows per tile: tiny vs pixels — pin once so
    # the border/fragment consumers don't re-run the pixel pass
    emitted = tiles.map_batches(emit, batch_format="pyarrow",
                                batch_size=16).materialize()

    borders = emitted.filter(expr="kind == 0").select_columns(
        ["key", "lab"])
    frags = emitted.filter(expr="kind == 1").select_columns(
        ["lab", "area", "x_min", "y_min", "x_max", "y_max"])

    def border_edges(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("key")["lab"]
        both = g.agg(["min", "max", "size"])
        both = both[both["size"] == 2]  # edge exists iff both masked
        e = both[both["min"] != both["max"]]
        return pd.DataFrame({"la": e["min"].to_numpy(np.int64),
                             "lb": e["max"].to_numpy(np.int64)}
                            ).drop_duplicates()

    edges = joins.partitioned_map(borders, ["key"], border_edges,
                                  num_partitions=num_partitions,
                                  pre_repartition=False)
    labels = joins.connected_components(
        edges, a_col="la", b_col="lb", num_partitions=num_partitions)

    frag_schema = pa.schema([
        ("lab", pa.int64()), ("area", pa.int64()),
        ("x_min", pa.int64()), ("y_min", pa.int64()),
        ("x_max", pa.int64()), ("y_max", pa.int64())])
    lab_schema = pa.schema([("node", pa.int64()), ("label", pa.int64())])
    mapped = joins.hash_join(
        frags, labels, on="lab", right_on="node", how="left",
        num_partitions=num_partitions,
        left_schema=frag_schema, right_schema=lab_schema)

    def key_blob(df: pd.DataFrame) -> pd.DataFrame:
        # un-merged fragments (no border edge) keep their local label
        blob = df["label"].fillna(df["lab"]).astype("int64")
        return df.assign(blob_id=blob).drop(columns=["lab", "label"])

    keyed = mapped.map_batches(key_blob, batch_format="pandas")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("blob_id", as_index=False).agg(
            area=("area", "sum"),
            x_min=("x_min", "min"), y_min=("y_min", "min"),
            x_max=("x_max", "max"), y_max=("y_max", "max"))
        for c in g.columns:
            g[c] = g[c].astype("int64")
        return g

    return joins.partitioned_map(keyed, ["blob_id"], fold,
                                 num_partitions=num_partitions,
                                 pre_repartition=False)
