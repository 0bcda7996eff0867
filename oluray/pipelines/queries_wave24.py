"""Wave-24 catalog: leakage-safe spatial train/test split and
two-sample spatial drift components.

`spatial_split` is the geospatial-ML data split done right: block
splitting with a BUFFER zone. Points are binned into res-3 blocks;
a deterministic block rule ((bx mod 4 <= 1) AND (by mod 4 <= 1))
assigns test blocks; train points in any block Chebyshev-adjacent
to a test block become `buffer` (excluded from training — the
standard guard against spatial autocorrelation leakage). The
neighbor check is pure arithmetic on the block rule (no join at
all), so the whole operator is a single vectorized map.

`spatial_drift` is the two-sample distribution-shift screen over
space: per res-4 cell, counts of the two point populations (events
vs orders) plus the exact signed contingency component
d = n_a*T_b - n_b*T_a (chi-square's per-cell numerator root; the
final sum of d^2/((n_a+n_b)*T_a*T_b) is the caller's fold). One
pass over each corpus through per-block cell combiners; the align
runs union + grouped-sum on aggregate-sized lattice tables. At
population products beyond int64 the d column needs the split-word
discipline `q_group_linreg` documents; the SQL twin already runs
HUGEINT.
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
# spatial_split — buffered block train/test assignment
# ---------------------------------------------------------------------------

SPLIT_RES = 3  # 8 x 8 blocks


def _is_test(bx: np.ndarray, by: np.ndarray) -> np.ndarray:
    return (bx % 4 <= 1) & (by % 4 <= 1)


def q_spatial_split(sf_dir: str):
    """(event_id, split) with split in {test, buffer, train}: test by
    the deterministic block rule, buffer = train block adjacent
    (Chebyshev 1, off-grid neighbors ignored) to any test block.
    Zero-shuffle: one vectorized map over the corpus."""
    from oluray.pipelines.queries import _with_points

    ev = _read(sf_dir, "events", ["event_id"])
    pts = _with_points(ev, "event_id")
    n = 1 << SPLIT_RES

    def assign(t: pa.Table) -> pa.Table:
        c = geo.cell_encode(
            t["lon"].to_numpy(zero_copy_only=False),
            t["lat"].to_numpy(zero_copy_only=False), SPLIT_RES)
        rem = c - np.int64(SPLIT_RES) * np.int64(geo.RES_SHIFT)
        by, bx = rem // np.int64(geo.Y_SHIFT), rem % np.int64(geo.Y_SHIFT)
        test = _is_test(bx, by)
        near = np.zeros(len(c), dtype=bool)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                nx, ny = bx + dx, by + dy
                ok = (nx >= 0) & (nx < n) & (ny >= 0) & (ny < n)
                near |= ok & _is_test(nx, ny)
        split = np.where(test, "test",
                         np.where(near, "buffer", "train"))
        return pa.table({
            "event_id": t["event_id"],
            "split": pa.array(split.astype(object), pa.string())})

    return pts.map_batches(assign, batch_format="pyarrow")


def _split_sql() -> str:
    lon, lat = geo.derive_lonlat_sql("event_id")
    x, y = geo.cell_xy_sql(lon, lat, SPLIT_RES)
    n = 1 << SPLIT_RES
    test = "((bx % 4 <= 1) AND (by % 4 <= 1))"
    nbr = " OR ".join(
        f"(bx + {dx} BETWEEN 0 AND {n - 1} AND by + {dy} BETWEEN 0 AND "
        f"{n - 1} AND ((bx + {dx}) % 4 <= 1) AND ((by + {dy}) % 4 <= 1))"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0))
    return f"""
    WITH b AS (SELECT event_id, {x} AS bx, {y} AS by FROM events)
    SELECT event_id,
           CASE WHEN {test} THEN 'test'
                WHEN {nbr} THEN 'buffer'
                ELSE 'train' END AS split
    FROM b
    """


# ---------------------------------------------------------------------------
# spatial_drift — per-cell two-sample contingency components
# ---------------------------------------------------------------------------

DRIFT_RES = 4  # 16 x 16


def q_spatial_drift(sf_dir: str):
    """(cell, n_a, n_b, d) over occupied cells of either population:
    n_a = events, n_b = orders, d = n_a*T_b - n_b*T_a exact. One
    pass per corpus; align + totals on the aggregate lattice."""
    from oluray.pipelines.queries import _with_points

    def counts(ds, key, col):
        pts = _with_points(ds, key)

        def cells(t: pa.Table) -> pa.Table:
            c = geo.cell_encode(
                t["lon"].to_numpy(zero_copy_only=False),
                t["lat"].to_numpy(zero_copy_only=False), DRIFT_RES)
            u, cnt = np.unique(c, return_counts=True)
            z = np.zeros(len(u), dtype=np.int64)
            return pa.table({"cell": pa.array(u),
                             "n_a": pa.array(cnt.astype(np.int64)
                                             if col == "n_a" else z),
                             "n_b": pa.array(cnt.astype(np.int64)
                                             if col == "n_b" else z)})

        return pts.map_batches(cells, batch_format="pyarrow")

    ev = counts(_read(sf_dir, "events", ["event_id"]),
                "event_id", "n_a")
    od = counts(_read(sf_dir, "orders", ["o_orderkey"]),
                "o_orderkey", "n_b")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cell", as_index=False)[["n_a", "n_b"]].sum()
        for c in ("cell", "n_a", "n_b"):
            g[c] = g[c].astype("int64")
        return g

    cells = joins.grouped_agg(ev.union(od), ["cell"], fold,
                              num_partitions=8,
                              pre_repartition=False).materialize()
    t_a = int(cells.sum("n_a") or 0)
    t_b = int(cells.sum("n_b") or 0)

    def comp(t: pa.Table) -> pa.Table:
        na = t["n_a"].to_numpy(zero_copy_only=False)
        nb = t["n_b"].to_numpy(zero_copy_only=False)
        return pa.table({"cell": t["cell"], "n_a": t["n_a"],
                         "n_b": t["n_b"],
                         "d": pa.array(na * np.int64(t_b)
                                       - nb * np.int64(t_a))})

    return cells.map_batches(comp, batch_format="pyarrow")


def _drift_sql() -> str:
    elon, elat = geo.derive_lonlat_sql("event_id")
    olon, olat = geo.derive_lonlat_sql("o_orderkey")
    ecell = geo.cell_encode_sql(elon, elat, DRIFT_RES)
    ocell = geo.cell_encode_sql(olon, olat, DRIFT_RES)
    return f"""
    WITH a AS (SELECT cell, count(*)::BIGINT AS n_a
               FROM (SELECT {ecell} AS cell FROM events) GROUP BY cell),
    b AS (SELECT cell, count(*)::BIGINT AS n_b
          FROM (SELECT {ocell} AS cell FROM orders) GROUP BY cell),
    j AS (SELECT COALESCE(a.cell, b.cell) AS cell,
                 COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
          FROM a FULL OUTER JOIN b ON a.cell = b.cell),
    t AS (SELECT SUM(n_a)::HUGEINT AS ta, SUM(n_b)::HUGEINT AS tb
          FROM j)
    SELECT cell, n_a, n_b,
           (n_a::HUGEINT * t.tb - n_b::HUGEINT * t.ta)::BIGINT AS d
    FROM j, t
    """


QUERIES = {
    "spatial_split": q_spatial_split,
    "spatial_drift": q_spatial_drift,
}

ORACLE = {
    "spatial_split": _split_sql(),
    "spatial_drift": _drift_sql(),
}
