"""Wave-17 catalog: D8 flow accumulation, OLAP cube rollup, and the
per-image mipmap pyramid.

`flow_accum` is the hydrology classic (watershed/drainage modeling)
on the count raster: each cell drains to its strictly-lowest
8-neighbor (deterministic tie-break), giving an acyclic functional
forest; a cell's accumulation is the number of upstream cells whose
drainage path passes through it. The oracle walks the same forest
with a recursive CTE. The engine processes the aggregate-sized
raster in one vectorized task (descending-elevation level sweep —
the size-probed fast path; at raster sizes beyond 4^res the same
message passing runs as the `bfs_hops`-shaped frontier loop).

`cube_rollup` is the OLAP GROUPING SETS operator: one corpus pass
into the (cell, day) combiner, then the three coarser grouping sets
are expanded FROM THE AGGREGATE (x4 tiny rows), never by re-scanning
the corpus — the same one-pass-then-rollup shape as `tile_pyramid`,
applied to the cube lattice.

`image_pyramid` is the mipmap chain (every texture/tile server's
downsample path): repeated 2x2 box-sum halving of each image's gray
raster down to 1x1, exact integer block sums, odd edges folded by
truncated blocks. Decode-local; rows-only (pixel decode is not SQL),
brute-verified against an independent reference.
Registered by ``oluray.pipelines.queries``.
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
# flow_accum — D8 drainage accumulation on the order-count raster
# ---------------------------------------------------------------------------

FA_RES = 4  # 16 x 16


def q_flow_accum(sf_dir: str):
    """D8 flow accumulation: per-cell ORDER counts are the
    'elevation'; every occupied cell drains to its strictly-lower
    minimum 8-neighbor (ties: smaller n, then smaller gx, then
    smaller gy; no x-wrap), and accumulation counts the upstream
    cells draining through. Strictly-decreasing flow => acyclic, so
    one descending-elevation sweep settles every path. Output
    (cell, n_upstream) for cells receiving any flow."""
    orders = _read(sf_dir, "orders", ["o_orderkey"])
    n = 1 << FA_RES

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
        _fa_accumulate, batch_format="pandas", batch_size=None)


def _fa_accumulate(df: pd.DataFrame) -> pd.DataFrame:
    """Single aggregate-sized task (<= 4^FA_RES rows): build the
    functional D8 forest, sweep elevation levels descending.
    Module-level so the hand-built-basin pytest drives the exact
    production kernel."""
    n = 1 << FA_RES
    empty = pd.DataFrame({
        "cell": pd.Series([], dtype="int64"),
        "n_upstream": pd.Series([], dtype="int64")})
    if len(df) == 0:
        return empty
    c = df["cell"].to_numpy(np.int64)
    v = df["n"].to_numpy(np.int64)
    rem = c - FA_RES * geo.RES_SHIFT
    gy, gx = rem // geo.Y_SHIFT, rem % geo.Y_SHIFT
    dense = np.full((n, n), -1, dtype=np.int64)  # -1 = empty
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
    acc = np.zeros(len(c), dtype=np.int64)
    order = np.argsort(-v, kind="stable")
    for lvl_val in np.unique(v)[::-1]:
        at = order[v[order] == lvl_val]
        at = at[dn[at] >= 0]
        if len(at):
            np.add.at(acc, dn[at], acc[at] + 1)
    got = acc > 0
    return pd.DataFrame({"cell": c[got], "n_upstream": acc[got]})


def _flow_accum_sql() -> str:
    lon, lat = geo.derive_lonlat_sql("o_orderkey")
    n = 1 << FA_RES
    x = (f"LEAST(GREATEST(floor((({lon} + 180.0) / 360.0) * {float(n)!r})"
         f"::BIGINT, 0), {n - 1})")
    y = (f"LEAST(GREATEST(floor((({lat} + 90.0) / 180.0) * {float(n)!r})"
         f"::BIGINT, 0), {n - 1})")
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
  SELECT cell, dn AS cur FROM dirs
  UNION ALL
  SELECT p.cell, d.dn FROM paths p JOIN dirs d ON d.cell = p.cur)
SELECT cur AS cell, count(*)::BIGINT AS n_upstream
FROM paths GROUP BY cur
"""


# ---------------------------------------------------------------------------
# cube_rollup — GROUPING SETS over (cell, day)
# ---------------------------------------------------------------------------

CUBE_RES = 3  # 8 x 8 cells


def q_cube_rollup(sf_dir: str):
    """OLAP cube over (res-3 cell, event day): count + exact
    value-cents sum (half-away round, the DuckDB `round()`
    semantics) for all four grouping sets (cell x day, cell, day,
    grand total). One corpus pass into the finest combiner; the coarser
    sets are re-aggregated from the (aggregate-sized) finest level —
    never a corpus re-scan. Grouping nulls surface as the sentinels
    -1 / 'ALL' so the oracle hash is NULL-free."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "value"])

    def fine(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon, lat = geo.derive_lonlat(eid)
        cell = geo.cell_encode(lon, lat, CUBE_RES)
        from oluray.pipelines.queries import _round_half_away

        day = (t["ts"].to_pandas().astype("datetime64[us]")
               .dt.strftime("%Y-%m-%d").to_numpy())
        val = _round_half_away(
            t["value"].to_numpy(zero_copy_only=False) * 100.0)
        df = pd.DataFrame({"cell": cell, "day": day, "v": val})
        g = df.groupby(["cell", "day"], as_index=False).agg(
            n_events=("v", "size"), sum_value=("v", "sum"))
        g["n_events"] = g["n_events"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["cell", "day"], as_index=False).agg(
            n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))
        return g

    finest = joins.grouped_agg(
        ev.map_batches(fine, batch_format="pyarrow"),
        ["cell", "day"], agg, num_partitions=8, pre_repartition=False,
    ).materialize()  # <= 4^res * |days| rows — aggregate-sized

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        outs = [df.assign(gset=0)]
        outs.append(df.assign(day="ALL", gset=1))
        outs.append(df.assign(cell=-1, gset=2))
        outs.append(df.assign(cell=-1, day="ALL", gset=3))
        allr = pd.concat(outs, ignore_index=True)
        g = allr.groupby(["cell", "day"], as_index=False).agg(
            n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))
        return g

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["cell", "day"], as_index=False).agg(
            n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))
        return g

    return joins.grouped_agg(
        finest.map_batches(expand, batch_format="pandas"),
        ["cell", "day"], final, num_partitions=4, pre_repartition=False)


def _cube_rollup_sql() -> str:
    lon, lat = geo.derive_lonlat_sql("event_id")
    cell = geo.cell_encode_sql(lon, lat, CUBE_RES)
    return f"""
SELECT COALESCE(cell, -1) AS cell, COALESCE(day, 'ALL') AS day,
       count(*)::BIGINT AS n_events, sum(v)::BIGINT AS sum_value
FROM (SELECT {cell} AS cell, strftime(ts, '%Y-%m-%d') AS day,
             round(value * 100.0)::BIGINT AS v
      FROM events)
GROUP BY GROUPING SETS ((cell, day), (cell), (day), ())
"""


# ---------------------------------------------------------------------------
# image_pyramid — per-image mipmap chain with exact block sums
# ---------------------------------------------------------------------------


class MipmapStats:
    """Actor-pool stage: decode once, halve by 2x2 box sums down to
    1x1 (odd edges -> truncated blocks), emit per-level dims + the
    exact sum of SQUARED block values (content-sensitive: conserved
    sums alone would not distinguish levels)."""

    def __init__(self):
        from oluray.functions import imagecodec

        self.decode = imagecodec.decode

    @staticmethod
    def _halve(a: np.ndarray) -> np.ndarray:
        h, w = a.shape
        h2, w2 = (h + 1) // 2, (w + 1) // 2
        out = np.zeros((h2, w2), dtype=np.int64)
        out += a[0::2, 0::2]
        if w > 1:
            out[:, : w // 2] += a[0::2, 1::2]
        if h > 1:
            out[: h // 2, :] += a[1::2, 0::2]
        if h > 1 and w > 1:
            out[: h // 2, : w // 2] += a[1::2, 1::2]
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("image_id", "level", "h", "w",
                               "sum_sq", "px_sum")}
        for iid, blob, fmt in zip(batch["image_id"].to_pylist(),
                                  batch["bytes"].to_pylist(),
                                  batch["fmt"].to_pylist()):
            a = self.decode(blob, fmt).astype(np.int64).sum(axis=2)
            level = 0
            while True:
                out["image_id"].append(iid)
                out["level"].append(level)
                out["h"].append(a.shape[0])
                out["w"].append(a.shape[1])
                out["sum_sq"].append(int((a * a).sum()))  # fits int64:
                # top block value <= 765*64*64 ~ 3.1e6, squared ~ 1e13
                out["px_sum"].append(int(a.sum()))
                if a.shape == (1, 1):
                    break
                a = self._halve(a)
                level += 1
        return pa.table({
            "image_id": pa.array(out["image_id"], pa.string()),
            "level": pa.array(out["level"], pa.int64()),
            "h": pa.array(out["h"], pa.int64()),
            "w": pa.array(out["w"], pa.int64()),
            "sum_sq": pa.array(out["sum_sq"], pa.int64()),
            "px_sum": pa.array(out["px_sum"], pa.int64())})


def q_image_pyramid(sf_dir: str):
    """Mipmap pyramid per image: exact 2x2 box-sum halving chain down
    to 1x1. Decode-local; one tiny row per (image, level) leaves the
    task. Rows-only; brute-verified in pytest (dims, conserved
    px_sum, sum-of-squares per level vs an independent reference)."""
    from oluray.pipelines.queries import _synth_images

    images = _synth_images(sf_dir)
    return images.map_batches(MipmapStats, batch_format="pyarrow",
                              batch_size=256, concurrency=(1, 4))


QUERIES = {
    "flow_accum": q_flow_accum,
    "cube_rollup": q_cube_rollup,
    "image_pyramid": q_image_pyramid,
}

ORACLE = {
    "flow_accum": _flow_accum_sql(),
    "cube_rollup": _cube_rollup_sql(),
}
