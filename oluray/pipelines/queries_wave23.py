"""Wave-23 catalog: D8 watershed basin labeling, deterministic
spatial thinning, and per-image colorfulness moments.

`flow_basins` completes wave-17's hydrology pair: every occupied
cell labeled with the SINK its D8 drainage path terminates in (the
watershed partition). The drainage forest is the same
strictly-decreasing functional graph `_fa_accumulate` builds, so
one ASCENDING-elevation sweep settles every label (a cell's target
is strictly lower, hence already labeled). The oracle follows the
identical forest with a recursive CTE and keeps each path's
terminal.

`spatial_thin` is cartographic thinning / spatial dedup: one
representative event per occupied res-6 cell, the deterministic
min(event_id) pick — the coverage-preserving downsample behind
label decluttering and spatially-stratified training splits. One
corpus pass through a per-block (cell, min) combiner.

`image_colorfulness` is the Hasler-Süsstrunk colorfulness metric's
exact integer core: per image, opponent channels rg = R-G and
yb2 = R+G-2B (doubled to stay integral) reduced to exact moment
sums (n, sum, sum-of-squares each) — the final
sqrt(var_rg + var_yb) + 0.3*sqrt(mean²) fold is the caller's.
Decode-local actor stage; rows-only; brute-verified in pytest.
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from oluray.functions import geo
from oluray.pipelines.queries_wave17 import FA_RES
from oluray.stages import joins


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# flow_basins — watershed partition of the D8 drainage forest
# ---------------------------------------------------------------------------


def _fb_label(df: pd.DataFrame) -> pd.DataFrame:
    """Single aggregate-sized task: rebuild the wave-17 D8 forest
    (same neighbor/tie rules), then label basins in one ascending-
    elevation sweep. Module-level so pytest drives the production
    kernel."""
    n = 1 << FA_RES
    if len(df) == 0:
        return pd.DataFrame({"cell": pd.Series([], dtype="int64"),
                             "basin": pd.Series([], dtype="int64")})
    c = df["cell"].to_numpy(np.int64)
    v = df["n"].to_numpy(np.int64)
    rem = c - FA_RES * geo.RES_SHIFT
    gy, gx = rem // geo.Y_SHIFT, rem % geo.Y_SHIFT
    dense = np.full((n, n), -1, dtype=np.int64)
    dense[gy, gx] = np.arange(len(c))
    dn = np.full(len(c), -1, dtype=np.int64)
    best = np.full((len(c), 3), np.iinfo(np.int64).max)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            ny, nx = gy + dy, gx + dx
            ok = (ny >= 0) & (ny < n) & (nx >= 0) & (nx < n)
            idx = np.where(ok)[0]
            nb = dense[ny[idx], nx[idx]]
            has = nb >= 0
            idx, nb = idx[has], nb[has]
            lower = v[nb] < v[idx]
            idx, nb = idx[lower], nb[lower]
            key = np.stack([v[nb], gx[nb], gy[nb]], axis=1)
            better = (
                (key[:, 0] < best[idx, 0])
                | ((key[:, 0] == best[idx, 0])
                   & ((key[:, 1] < best[idx, 1])
                      | ((key[:, 1] == best[idx, 1])
                         & (key[:, 2] < best[idx, 2])))))
            upd = idx[better]
            best[upd] = key[better]
            dn[upd] = nb[better]
    basin = c.copy()  # sinks label themselves
    order = np.argsort(v, kind="stable")
    for lvl_val in np.unique(v):
        at = order[v[order] == lvl_val]
        at = at[dn[at] >= 0]
        if len(at):
            # targets are strictly lower -> already final
            basin[at] = basin[dn[at]]
    return pd.DataFrame({"cell": c, "basin": basin})


def q_flow_basins(sf_dir: str):
    """(cell, basin) for every occupied cell of the order-count
    terrain: basin = the sink cell its D8 drainage path reaches.
    Same one-corpus-pass combiner + aggregate-sized single task as
    `flow_accum` (frontier-loop alternative beyond 4^res)."""
    orders = _read(sf_dir, "orders", ["o_orderkey"])

    def cells(t: pa.Table) -> pa.Table:
        okey = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        lon, lat = geo.derive_lonlat(okey)
        c = geo.cell_encode(lon, lat, FA_RES)
        u, cnt = np.unique(c, return_counts=True)
        return pa.table({"cell": pa.array(u),
                         "n": pa.array(cnt.astype(np.int64))})

    def csum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("cell", as_index=False)["n"].sum()

    counts = joins.grouped_agg(
        orders.map_batches(cells, batch_format="pyarrow"),
        ["cell"], csum, num_partitions=8, pre_repartition=False)
    return counts.repartition(1).map_batches(
        _fb_label, batch_format="pandas", batch_size=None)


def _flow_basins_sql() -> str:
    lon, lat = geo.derive_lonlat_sql("o_orderkey")
    x, y = geo.cell_xy_sql(lon, lat, FA_RES)
    return f"""
WITH RECURSIVE c AS (
  SELECT x, y, ({FA_RES} * {geo.RES_SHIFT} + y * {geo.Y_SHIFT} + x)
           AS cell,
         count(*)::BIGINT AS v
  FROM (SELECT {x} AS x, {y} AS y FROM orders) GROUP BY x, y),
dirs AS (
  SELECT cell, dn FROM (
    SELECT a.cell, b.cell AS dn,
           row_number() OVER (PARTITION BY a.cell
                              ORDER BY b.v, b.x, b.y) AS rk
    FROM c a JOIN c b
      ON abs(a.x - b.x) <= 1 AND abs(a.y - b.y) <= 1
     AND NOT (a.x = b.x AND a.y = b.y)
     AND b.v < a.v)
  WHERE rk = 1),
paths AS (
  SELECT cell, cell AS cur FROM c
  UNION ALL
  SELECT p.cell, d.dn FROM paths p JOIN dirs d ON d.cell = p.cur)
SELECT cell, cur AS basin
FROM paths WHERE cur NOT IN (SELECT cell FROM dirs)
"""


# ---------------------------------------------------------------------------
# spatial_thin — one representative event per occupied cell
# ---------------------------------------------------------------------------

THIN_RES = 6  # 64 x 64


def q_spatial_thin(sf_dir: str):
    """(cell, event_id) keeping the minimum event id per occupied
    res-6 cell — deterministic cartographic thinning. Per-block
    combiner bounds the shuffle at distinct-cells-per-block."""
    from oluray.pipelines.queries import _with_points

    ev = _read(sf_dir, "events", ["event_id"])
    pts = _with_points(ev, "event_id")

    def pick(t: pa.Table) -> pa.Table:
        c = geo.cell_encode(
            t["lon"].to_numpy(zero_copy_only=False),
            t["lat"].to_numpy(zero_copy_only=False), THIN_RES)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        df = pd.DataFrame({"cell": c, "event_id": eid})
        g = df.groupby("cell", as_index=False)["event_id"].min()
        return pa.Table.from_pandas(g, preserve_index=False)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cell", as_index=False)["event_id"].min()
        for col in ("cell", "event_id"):
            g[col] = g[col].astype("int64")
        return g

    return joins.grouped_agg(
        pts.map_batches(pick, batch_format="pyarrow"),
        ["cell"], fold, num_partitions=8, pre_repartition=False)


def _thin_sql() -> str:
    lon, lat = geo.derive_lonlat_sql("event_id")
    cell = geo.cell_encode_sql(lon, lat, THIN_RES)
    return f"""
    SELECT cell, min(event_id)::BIGINT AS event_id
    FROM (SELECT {cell} AS cell, event_id FROM events)
    GROUP BY cell
    """


# ---------------------------------------------------------------------------
# image_colorfulness — exact opponent-channel moments per image
# ---------------------------------------------------------------------------


class ColorfulnessStage:
    """Actor-pool stage: decode once, emit exact int64 moments of
    rg = R-G and yb2 = R+G-2B per image."""

    def __init__(self):
        from oluray.functions import imagecodec

        self.decode = imagecodec.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("image_id", "n_px", "sum_rg", "sum_rg2",
                               "sum_yb2", "sum_yb22")}
        for iid, blob, fmt in zip(batch["image_id"].to_pylist(),
                                  batch["bytes"].to_pylist(),
                                  batch["fmt"].to_pylist()):
            px = self.decode(blob, fmt).astype(np.int64)
            rg = px[:, :, 0] - px[:, :, 1]
            yb2 = px[:, :, 0] + px[:, :, 1] - 2 * px[:, :, 2]
            out["image_id"].append(iid)
            out["n_px"].append(int(rg.size))
            out["sum_rg"].append(int(rg.sum()))
            out["sum_rg2"].append(int((rg * rg).sum()))
            out["sum_yb2"].append(int(yb2.sum()))
            out["sum_yb22"].append(int((yb2 * yb2).sum()))
        return pa.table({k: pa.array(v, pa.int64()) if k != "image_id"
                         else pa.array(v)
                         for k, v in out.items()})


def q_image_colorfulness(sf_dir: str):
    """Per-image exact opponent-channel moments (Hasler-Süsstrunk
    core). Decode-local; rows-only; brute-verified in pytest."""
    from oluray.pipelines.queries import _synth_images

    images = _synth_images(sf_dir)
    return images.map_batches(ColorfulnessStage, batch_format="pyarrow",
                              batch_size=256, concurrency=(1, 4))


QUERIES = {
    "flow_basins": q_flow_basins,
    "spatial_thin": q_spatial_thin,
    "image_colorfulness": q_image_colorfulness,
}

ORACLE = {
    "flow_basins": _flow_basins_sql(),
    "spatial_thin": _thin_sql(),
}
