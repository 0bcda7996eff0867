"""Wave-14 catalog: tile-pyramid rollup and marching-squares contour
cells — two raster-layer operators on the cell grid.

`tile_pyramid` is the web-map tiling primitive (the reference's grid
is one fixed resolution; a serving stack needs every zoom level):
the corpus passes ONCE into leaf-resolution counts, then each coarser
level is an aggregate over the previous level's occupied-cell table —
never a corpus re-scan. Exact because floor(v*2^r) == floor(v*2^R) >>
(R-r) for nested dyadic grids (clamp included).

`contour_cases` is the marching-squares classifier (raster -> vector
isoline extraction, the contouring step of every terrain/heatmap
renderer): each 2x2 block of the count raster gets its 4-bit case
from which corners clear the threshold; only mixed blocks (case
1..14) lie on the contour. Only HOT cells participate (a cold corner
contributes bit 0), so the whole stage is a <=4-way scatter of the
hot-cell table — aggregate-bounded, like `focal_mean`'s 3x3 scatter.
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
# tile_pyramid — counts at every resolution 0..PYR_RES
# ---------------------------------------------------------------------------

PYR_RES = 6  # leaf level: 64 x 64


def q_tile_pyramid(sf_dir: str):
    """Tile pyramid: event counts per cell at EVERY resolution
    0..6. One combiner pass over the corpus builds the res-6 leaf
    table; each coarser level is a (gx>>1, gy>>1) re-key + sum of the
    level below — 6 aggregates over tables bounded by min(|corpus|,
    4^res) rows. At 100 TB the leaf shuffle is the only wide step;
    the rollup chain moves kilobytes. Output (cell, n_events) with
    the resolution encoded in the cell id, exactly `cell_encode`."""
    ev = _read(sf_dir, "events", ["event_id"])

    def leaf(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon, lat = geo.derive_lonlat(eid)
        cell = geo.cell_encode(lon, lat, PYR_RES)
        cells, counts = np.unique(cell, return_counts=True)
        return pa.table({"cell": pa.array(cells),
                         "n_events": pa.array(counts.astype(np.int64))})

    def csum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("cell", as_index=False)["n_events"].sum()

    level = joins.grouped_agg(
        ev.map_batches(leaf, batch_format="pyarrow"),
        ["cell"], csum, num_partitions=8, pre_repartition=False,
    ).materialize()  # leaf table: <= 4^PYR_RES rows, reused 7x

    levels = [level]
    for res in range(PYR_RES, 0, -1):
        def up(t: pa.Table, res=res) -> pa.Table:
            c = t["cell"].to_numpy(zero_copy_only=False)
            rem = c - res * geo.RES_SHIFT
            gy, gx = rem // geo.Y_SHIFT, rem % geo.Y_SHIFT
            parent = ((res - 1) * geo.RES_SHIFT
                      + (gy >> 1) * geo.Y_SHIFT + (gx >> 1))
            return pa.table({
                "cell": pa.array(parent),
                "n_events": t["n_events"]})

        level = joins.grouped_agg(
            level.map_batches(up, batch_format="pyarrow"),
            ["cell"], csum, num_partitions=1, pre_repartition=False,
        ).materialize()
        levels.append(level)

    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def _tile_pyramid_sql() -> str:
    lon, lat = geo.derive_lonlat_sql("event_id")
    parts = []
    for res in range(PYR_RES + 1):
        parts.append(
            f"SELECT {geo.cell_encode_sql(lon, lat, res)} AS cell, "
            f"count(*)::BIGINT AS n_events FROM events GROUP BY 1")
    return "\nUNION ALL\n".join(parts)


# ---------------------------------------------------------------------------
# contour_cases — marching-squares block classification
# ---------------------------------------------------------------------------

CON_RES = 4   # 16 x 16 raster


def q_contour_cases(sf_dir: str):
    """Marching squares: per-cell order counts at res 4, iso
    threshold = strictly above the mean occupied-cell count (1 +
    total // n_cells, integer floor on both sides — scale-invariant,
    so the contour is non-degenerate at every sf), classify every
    2x2 corner block (bits TL=1, TR=2, BR=4, BL=8) and keep the
    mixed blocks (case 1..14) — the cells an isoline passes through.
    Cold corners contribute nothing, so the classifier is a
    <=4-target scatter of the HOT-cell table followed by a bit-sum —
    the corpus is touched only by the count combiner; the threshold
    is two scalar aggregates of the (aggregate-sized) cell table."""
    orders = _read(sf_dir, "orders", ["o_orderkey"])
    n = 1 << CON_RES

    def cells(t: pa.Table) -> pa.Table:
        okey = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon, lat = geo.derive_lonlat(okey)
        c = geo.cell_encode(lon, lat, CON_RES)
        u, cnt = np.unique(c, return_counts=True)
        return pa.table({"cell": pa.array(u),
                         "n": pa.array(cnt.astype(np.int64))})

    def csum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("cell", as_index=False)["n"].sum()

    counts = joins.grouped_agg(
        orders.map_batches(cells, batch_format="pyarrow"),
        ["cell"], csum, num_partitions=8, pre_repartition=False,
    ).materialize()  # occupied-cell table: <= 4^CON_RES rows
    thr = 1 + counts.sum("n") // counts.count()

    def scatter(t: pa.Table) -> pa.Table:
        empty = pa.table({"bx": pa.array([], pa.int64()),
                          "by": pa.array([], pa.int64()),
                          "bit": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        c = t["cell"].to_numpy(zero_copy_only=False)
        cnt = t["n"].to_numpy(zero_copy_only=False)
        hot = cnt >= thr
        if not hot.any():
            return empty
        rem = c[hot] - CON_RES * geo.RES_SHIFT
        cy, cx = rem // geo.Y_SHIFT, rem % geo.Y_SHIFT
        bxs, bys, bits = [], [], []
        # cell (cx,cy) is the TL/TR/BR/BL corner of 4 blocks
        for dx, dy, bit in ((0, 0, 1), (-1, 0, 2), (-1, -1, 4), (0, -1, 8)):
            bx, by = cx + dx, cy + dy
            ok = (bx >= 0) & (bx <= n - 2) & (by >= 0) & (by <= n - 2)
            bxs.append(bx[ok])
            bys.append(by[ok])
            bits.append(np.full(int(ok.sum()), bit, dtype=np.int64))
        return pa.table({"bx": pa.array(np.concatenate(bxs)),
                         "by": pa.array(np.concatenate(bys)),
                         "bit": pa.array(np.concatenate(bits))})

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["bx", "by"], as_index=False)["bit"].sum()
        g = g.rename(columns={"bit": "mcase"})
        return g[(g["mcase"] >= 1) & (g["mcase"] <= 14)]

    return joins.grouped_agg(
        counts.map_batches(scatter, batch_format="pyarrow"),
        ["bx", "by"], classify, num_partitions=4, pre_repartition=False)


def _contour_cases_sql() -> str:
    lon, lat = geo.derive_lonlat_sql("o_orderkey")
    n = 1 << CON_RES
    x = (f"LEAST(GREATEST(floor((({lon} + 180.0) / 360.0) * {float(n)!r})"
         f"::BIGINT, 0), {n - 1})")
    y = (f"LEAST(GREATEST(floor((({lat} + 90.0) / 180.0) * {float(n)!r})"
         f"::BIGINT, 0), {n - 1})")
    return f"""
WITH pc AS (
  SELECT x, y, count(*)::BIGINT AS n
  FROM (SELECT {x} AS x, {y} AS y FROM orders) GROUP BY x, y),
t AS (SELECT 1 + sum(n)::BIGINT // count(*)::BIGINT AS thr FROM pc),
hot AS (
  SELECT x, y FROM pc, t WHERE n >= thr),
sc AS (
  SELECT x + d.dx AS bx, y + d.dy AS by, d.bit
  FROM hot, (VALUES (0, 0, 1), (-1, 0, 2), (-1, -1, 4), (0, -1, 8))
            AS d(dx, dy, bit)
  WHERE x + d.dx BETWEEN 0 AND {n - 2}
    AND y + d.dy BETWEEN 0 AND {n - 2})
SELECT bx, by, sum(bit)::BIGINT AS mcase
FROM sc GROUP BY bx, by
HAVING sum(bit) BETWEEN 1 AND 14
"""


QUERIES = {
    "tile_pyramid": q_tile_pyramid,
    "contour_cases": q_contour_cases,
}

ORACLE = {
    "tile_pyramid": _tile_pyramid_sql(),
    "contour_cases": _contour_cases_sql(),
}
