"""Wave-43 catalog: spherical mean direction and busiest-hour
argmax.

`spherical_mean` is the geodesic centroid's sufficient statistic
(mean direction on the sphere — lat/lon averaging is WRONG across
the antimeridian; the 3-D unit-vector sum is the standard fix):
per event type, the exact sums of per-point unit vectors quantized
to 1e-9 fixed point — quantize-then-sum makes the fold associative
and the SQL twin bit-exact (the same per-point round the
`haversine_sql` oracles already rely on). The normalization /
atan2 readback is the caller's.

`busiest_hour` is the peak-load window: per occupied res-4 cell,
the hour-of-day with the most events (ties: smaller hour) and its
count — the capacity-planning argmax, deterministic tiebreak, the
`min_price_supplier` argmin pattern on a two-level key. One corpus
pass through a (cell, hour) combiner; the argmax folds the
aggregate table.
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from oluray.functions import geo
from oluray.stages import joins

BH_RES = 4
_HOUR_US = 3_600_000_000


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# spherical_mean — fixed-point unit-vector sums per event type
# ---------------------------------------------------------------------------


def q_spherical_mean(sf_dir: str):
    """(event_type, n, sx, sy, sz): sums of per-point unit vectors
    quantized to 1e-9 (sx = sum round(cos(lat)cos(lon)*1e9), ...).
    Mean direction = atan2 readback; resultant length R = |s|/n/1e9
    is the concentration measure."""
    from oluray.pipelines.queries import _round_half_away, _with_points

    ev = _read(sf_dir, "events", ["event_id", "event_type"])
    pts = _with_points(ev, "event_id")

    def vecs(t: pa.Table) -> pa.Table:
        lon = np.radians(t["lon"].to_numpy(zero_copy_only=False))
        lat = np.radians(t["lat"].to_numpy(zero_copy_only=False))
        cx = _round_half_away(np.cos(lat) * np.cos(lon) * 1e9)
        cy = _round_half_away(np.cos(lat) * np.sin(lon) * 1e9)
        cz = _round_half_away(np.sin(lat) * 1e9)
        df = pd.DataFrame({
            "event_type": t["event_type"].to_pandas(),
            "n": np.ones(len(cx), dtype=np.int64),
            "sx": cx, "sy": cy, "sz": cz})
        return pa.Table.from_pandas(
            df.groupby("event_type", as_index=False).sum(),
            preserve_index=False)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", as_index=False)[
            ["n", "sx", "sy", "sz"]].sum()
        for c in ("n", "sx", "sy", "sz"):
            g[c] = g[c].astype("int64")
        return g

    return joins.grouped_agg(
        pts.map_batches(vecs, batch_format="pyarrow"),
        ["event_type"], fold, num_partitions=4,
        pre_repartition=False)


def _spherical_sql() -> str:
    lon, lat = geo.derive_lonlat_sql("event_id")
    return f"""
    SELECT event_type, count(*)::BIGINT AS n,
           SUM(round(cos(radians(lat)) * cos(radians(lon)) * 1e9, 0)
               ::BIGINT)::BIGINT AS sx,
           SUM(round(cos(radians(lat)) * sin(radians(lon)) * 1e9, 0)
               ::BIGINT)::BIGINT AS sy,
           SUM(round(sin(radians(lat)) * 1e9, 0)::BIGINT)::BIGINT
             AS sz
    FROM (SELECT event_type, {lon} AS lon, {lat} AS lat FROM events)
    GROUP BY event_type
    """


# ---------------------------------------------------------------------------
# busiest_hour — per-cell peak hour-of-day
# ---------------------------------------------------------------------------


def q_busiest_hour(sf_dir: str):
    """(cell, hour, n_events): the hour-of-day (0..23, UTC) with the
    most events per occupied res-4 cell; ties -> smaller hour."""
    from oluray.pipelines.queries import _with_points

    ev = _read(sf_dir, "events", ["event_id", "ts"])
    pts = _with_points(ev, "event_id")

    def combine(t: pa.Table) -> pa.Table:
        c = geo.cell_encode(
            t["lon"].to_numpy(zero_copy_only=False),
            t["lat"].to_numpy(zero_copy_only=False), BH_RES)
        us = t["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        hour = (us // _HOUR_US) % 24
        df = pd.DataFrame({"cell": c, "hour": hour,
                           "n_events": np.ones(len(c),
                                               dtype=np.int64)})
        return pa.Table.from_pandas(
            df.groupby(["cell", "hour"], as_index=False).sum(),
            preserve_index=False)

    def argmax(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["cell", "hour"], as_index=False)[
            "n_events"].sum()
        g = g.sort_values(["cell", "n_events", "hour"],
                          ascending=[True, False, True])
        out = g.groupby("cell", as_index=False).first()
        for c in ("cell", "hour", "n_events"):
            out[c] = out[c].astype("int64")
        return out

    return joins.grouped_agg(
        pts.map_batches(combine, batch_format="pyarrow"),
        ["cell"], argmax, num_partitions=8, pre_repartition=False)


def _busiest_sql() -> str:
    lon, lat = geo.derive_lonlat_sql("event_id")
    cell = geo.cell_encode_sql(lon, lat, BH_RES)
    return f"""
    WITH c AS (
      SELECT cell, (epoch_us(ts) // {_HOUR_US}) % 24 AS hour,
             count(*)::BIGINT AS n_events
      FROM (SELECT {cell} AS cell, ts FROM events)
      GROUP BY cell, hour)
    SELECT cell, hour::BIGINT AS hour, n_events FROM c
    QUALIFY row_number() OVER (PARTITION BY cell
                               ORDER BY n_events DESC, hour) = 1
    """


QUERIES = {
    "spherical_mean": q_spherical_mean,
    "busiest_hour": q_busiest_hour,
}

ORACLE = {
    "spherical_mean": _spherical_sql(),
    "busiest_hour": _busiest_sql(),
}
