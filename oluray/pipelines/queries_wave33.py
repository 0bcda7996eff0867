"""Wave-33 catalog: anti-aliased cell coverage and the standard
deviational ellipse moment core.

`cell_coverage` is the renderer's partial-coverage (alpha) raster:
for each change polygon and each res-7 cell of its bbox, how many
of the cell's 4x4 subsample centers fall inside (0..16) — the
supersampling that turns hard PIP edges into coverage fractions.
The res-7 cell pitch is DYADIC (360/128 = 2.8125, 180/128 =
1.40625), so the subpoint coordinates are bit-identical between
numpy and the SQL twin, and the PIP verdicts reuse the
`point_in_polygon`/`pip_sql_expr` matched pair. Each cell also
carries its event count (0 where empty) — the data join a heat
renderer needs.

`spatial_ellipse` is the standard deviational ellipse's exact core
(the dispersion-direction statistic of crime/epidemiology mapping):
per event type, integer moments (n, sx, sy, sxx, syy, sxy) of the
res-10 grid coordinates — mean center, variances and covariance
(and thus ellipse axes/rotation) are the caller's divisions. Grid
coords are < 2^10, so all second moments fit BIGINT far past 1e12
rows.
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from oluray.functions import geo
from oluray.stages import joins

COV_RES = 7       # 128 x 128; dyadic pitch
_N = 1 << COV_RES
_DX = 360.0 / _N  # 2.8125, exactly representable
_DY = 180.0 / _N  # 1.40625, exactly representable
SUB = 4           # 4x4 subsamples

# Local copy of queries.PIP_POLYS (importing at module init would be
# circular — queries.py imports this module last). The wave-33
# pytest asserts the two dicts stay identical.
PIP_POLYS: dict[int, tuple[list[float], list[float]]] = {
    1: ([-20.0, 5.0, 17.3, 8.2, -11.7], [-8.3, -14.9, 2.7, 16.1, 9.4]),
    2: ([60.0, 95.0, 90.0, 75.0, 62.0], [10.2, 12.7, 35.3, 28.9, 30.1]),
    3: ([-150.0, -120.0, -125.0, -145.0], [-40.1, -35.2, -10.3, -15.4]),
    4: ([100.0, 130.0, 128.0, 115.0, 102.0],
        [-55.3, -54.1, -25.2, -45.7, -24.9]),
}


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# cell_coverage — 4x4 supersampled PIP coverage per (poly, cell)
# ---------------------------------------------------------------------------


def _poly_bbox_cells(rx, ry):
    x0 = int(np.floor((min(rx) + 180.0) / _DX))
    x1 = int(np.floor((max(rx) + 180.0) / _DX))
    y0 = int(np.floor((min(ry) + 90.0) / _DY))
    y1 = int(np.floor((max(ry) + 90.0) / _DY))
    clip = lambda v: max(0, min(_N - 1, v))  # noqa: E731
    return clip(x0), clip(x1), clip(y0), clip(y1)


def _coverage_rows(pid: int, rx, ry) -> pd.DataFrame:
    x0, x1, y0, y1 = _poly_bbox_cells(rx, ry)
    xs, ys = np.meshgrid(np.arange(x0, x1 + 1, dtype=np.int64),
                         np.arange(y0, y1 + 1, dtype=np.int64))
    xs, ys = xs.ravel(), ys.ravel()
    n_sub = np.zeros(len(xs), dtype=np.int64)
    for i in range(SUB):
        for j in range(SUB):
            lon = -180.0 + (xs + (2 * i + 1) / 8.0) * _DX
            lat = -90.0 + (ys + (2 * j + 1) / 8.0) * _DY
            n_sub += geo.point_in_polygon(
                lon, lat, np.asarray(rx), np.asarray(ry)
            ).astype(np.int64)
    keep = n_sub > 0
    cell = (np.int64(COV_RES) * np.int64(geo.RES_SHIFT)
            + ys[keep] * np.int64(geo.Y_SHIFT) + xs[keep])
    return pd.DataFrame({"poly_id": np.full(int(keep.sum()), pid,
                                            dtype=np.int64),
                         "cell": cell,
                         "n_sub16": n_sub[keep]})


def q_cell_coverage(sf_dir: str):
    """(poly_id, cell, n_sub16, n_events) over the PIP_POLYS set:
    partially-covered boundary cells carry 1..15, interior cells 16;
    n_events joins the res-7 occupied-event-cell counts (0 if the
    cell holds no events). Polygon sweeps are bbox-bounded tasks;
    the event join is aggregate-sized."""
    from oluray.pipelines.queries_wave18 import _event_cell_counts

    polys = ray.data.from_items(
        [{"pid": pid} for pid in sorted(PIP_POLYS)])

    def sweep(df: pd.DataFrame) -> pd.DataFrame:
        parts = [
            _coverage_rows(int(pid), *PIP_POLYS[int(pid)])
            for pid in df["pid"]
        ]
        return pd.concat(parts, ignore_index=True) if parts else \
            pd.DataFrame({"poly_id": pd.array([], dtype="int64"),
                          "cell": pd.array([], dtype="int64"),
                          "n_sub16": pd.array([], dtype="int64")})

    cov = polys.map_batches(sweep, batch_format="pandas")
    counts = _event_cell_counts(sf_dir, COV_RES).map_batches(
        lambda d: d.rename(columns={"v": "n_events"}),
        batch_format="pandas")
    j = joins.hash_join(cov, counts, "cell", num_partitions=8,
                        how="left")

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["poly_id", "cell", "n_sub16"]].copy()
        out["n_events"] = df["n_events"].fillna(0).astype("int64")
        return out

    return j.map_batches(fin, batch_format="pandas")


def _coverage_sql() -> str:
    lon_e, lat_e = geo.derive_lonlat_sql("event_id")
    x_e, y_e = geo.cell_xy_sql(lon_e, lat_e, COV_RES)
    branches = []
    for pid in sorted(PIP_POLYS):
        rx, ry = PIP_POLYS[pid]
        x0, x1, y0, y1 = _poly_bbox_cells(rx, ry)
        pip = geo.pip_sql_expr(
            rx, ry,
            f"(-180.0 + (gx.range + (2 * si.range + 1) / 8.0) * {_DX!r})",
            f"(-90.0 + (gy.range + (2 * sj.range + 1) / 8.0) * {_DY!r})")
        branches.append(f"""
      SELECT {pid} AS poly_id, gx.range AS x, gy.range AS y,
             SUM(CASE WHEN {pip} THEN 1 ELSE 0 END)::BIGINT AS n_sub16
      FROM range({x0}, {x1 + 1}) gx(range),
           range({y0}, {y1 + 1}) gy(range),
           range(0, {SUB}) si(range), range(0, {SUB}) sj(range)
      GROUP BY gx.range, gy.range
      HAVING SUM(CASE WHEN {pip} THEN 1 ELSE 0 END) > 0""")
    union = " UNION ALL ".join(branches)
    return f"""
    WITH cov AS ({union}),
    ev AS (SELECT x, y, count(*)::BIGINT AS n_events
           FROM (SELECT {x_e} AS x, {y_e} AS y FROM events)
           GROUP BY x, y)
    SELECT cov.poly_id,
           ({COV_RES} * {geo.RES_SHIFT} + cov.y * {geo.Y_SHIFT}
            + cov.x) AS cell,
           cov.n_sub16, COALESCE(ev.n_events, 0)::BIGINT AS n_events
    FROM cov LEFT JOIN ev ON cov.x = ev.x AND cov.y = ev.y
    """


# ---------------------------------------------------------------------------
# spatial_ellipse — SDE moment core per event type
# ---------------------------------------------------------------------------

SDE_RES = 10


def q_spatial_ellipse(sf_dir: str):
    """(event_type, n, sx, sy, sxx, syy, sxy): exact res-10
    grid-coordinate moments per event type — the standard
    deviational ellipse's sufficient statistics."""
    from oluray.pipelines.queries import _with_points

    ev = _read(sf_dir, "events", ["event_id", "event_type"])
    pts = _with_points(ev, "event_id")

    def moments(t: pa.Table) -> pa.Table:
        c = geo.cell_encode(
            t["lon"].to_numpy(zero_copy_only=False),
            t["lat"].to_numpy(zero_copy_only=False), SDE_RES)
        rem = c - np.int64(SDE_RES) * np.int64(geo.RES_SHIFT)
        y, x = rem // np.int64(geo.Y_SHIFT), rem % np.int64(geo.Y_SHIFT)
        df = pd.DataFrame({
            "event_type": t["event_type"].to_pandas(),
            "n": np.ones(len(x), dtype=np.int64),
            "sx": x, "sy": y, "sxx": x * x, "syy": y * y,
            "sxy": x * y})
        g = df.groupby("event_type", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", as_index=False)[
            ["n", "sx", "sy", "sxx", "syy", "sxy"]].sum()
        for c in ("n", "sx", "sy", "sxx", "syy", "sxy"):
            g[c] = g[c].astype("int64")
        return g

    return joins.grouped_agg(
        pts.map_batches(moments, batch_format="pyarrow"),
        ["event_type"], fold, num_partitions=4,
        pre_repartition=False)


def _sde_sql() -> str:
    lon, lat = geo.derive_lonlat_sql("event_id")
    x, y = geo.cell_xy_sql(lon, lat, SDE_RES)
    return f"""
    SELECT event_type, count(*)::BIGINT AS n,
           SUM(x)::BIGINT AS sx, SUM(y)::BIGINT AS sy,
           SUM(x * x)::BIGINT AS sxx, SUM(y * y)::BIGINT AS syy,
           SUM(x * y)::BIGINT AS sxy
    FROM (SELECT event_type, {x} AS x, {y} AS y FROM events)
    GROUP BY event_type
    """


QUERIES = {
    "cell_coverage": q_cell_coverage,
    "spatial_ellipse": q_spatial_ellipse,
}

ORACLE = {
    "cell_coverage": _coverage_sql(),
    "spatial_ellipse": _sde_sql(),
}
