"""Wave-44 catalog: synchronous binary stencil update (B3/S23) and
the active-day run-length spectrum.

`life_step` is the canonical synchronous binary cellular-automaton
update (Conway B3/S23) over the occupied res-5 event lattice —
the simplest complete exercise of simultaneous-read/write stencil
semantics (every naive in-place implementation gets it wrong): a
cell is alive next generation iff it has exactly 3 live Moore
neighbors, or is alive with exactly 2. The engine reuses the
wave-18 dilation scatter for neighbor counts (aggregate-bounded);
the oracle replays the 8-offset join. Border cells simply have
fewer neighbors (no wrap).

`active_runs` is the gaps-and-islands run-length spectrum of the
global activity calendar: lengths of maximal consecutive runs of
days with >= 1 event, tallied by length — the uptime/streak
statistic. The day series is aggregate-sized; the islands trick
(day - rank constant within a run) matches the SQL twin.
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from oluray.functions import geo
from oluray.stages import joins

LIFE_RES = 5
_DAY_US = 86_400_000_000


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# life_step — one B3/S23 generation on the occupancy lattice
# ---------------------------------------------------------------------------


def _life_fold(df: pd.DataFrame) -> pd.DataFrame:
    """Single aggregate-sized task: Moore neighbor counts by padded
    shifts, then the B3/S23 rule. Module-level so pytest drives the
    production kernel on hand patterns."""
    n = 1 << LIFE_RES
    occ = np.zeros((n, n), dtype=bool)
    if len(df):
        _, x, y = geo.cell_decode(df["cell"].to_numpy(np.int64))
        occ[y, x] = True
    p = np.pad(occ.astype(np.int64), 1)
    nb = np.zeros((n, n), dtype=np.int64)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            nb += p[1 + dy: 1 + dy + n, 1 + dx: 1 + dx + n]
    alive = (nb == 3) | (occ & (nb == 2))
    ys, xs = np.nonzero(alive)
    cells = (np.int64(LIFE_RES) * np.int64(geo.RES_SHIFT)
             + ys.astype(np.int64) * np.int64(geo.Y_SHIFT)
             + xs.astype(np.int64))
    return pd.DataFrame({"cell": cells})


def q_life_step(sf_dir: str):
    """(cell,) — the next generation of the occupied res-5 event
    lattice under B3/S23."""
    from oluray.pipelines.queries_wave18 import _event_cell_counts

    counts = _event_cell_counts(sf_dir, LIFE_RES)
    return counts.repartition(1).map_batches(
        _life_fold, batch_format="pandas", batch_size=None)


def _life_sql() -> str:
    lon, lat = geo.derive_lonlat_sql("event_id")
    x, y = geo.cell_xy_sql(lon, lat, LIFE_RES)
    n = 1 << LIFE_RES
    offs = ",".join(f"({dx},{dy})" for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1) if not (dx == 0 and dy == 0))
    return f"""
    WITH occ AS (
      SELECT DISTINCT x, y
      FROM (SELECT {x} AS x, {y} AS y FROM events)),
    nb AS (
      SELECT o.x + v.dx AS x, o.y + v.dy AS y,
             count(*)::BIGINT AS n
      FROM occ o, (VALUES {offs}) v(dx, dy)
      WHERE o.x + v.dx BETWEEN 0 AND {n - 1}
        AND o.y + v.dy BETWEEN 0 AND {n - 1}
      GROUP BY o.x + v.dx, o.y + v.dy),
    alive AS (
      SELECT nb.x, nb.y FROM nb
      LEFT JOIN occ ON occ.x = nb.x AND occ.y = nb.y
      WHERE nb.n = 3 OR (occ.x IS NOT NULL AND nb.n = 2))
    SELECT ({LIFE_RES} * {geo.RES_SHIFT} + y * {geo.Y_SHIFT} + x)
             AS cell
    FROM alive
    """


# ---------------------------------------------------------------------------
# active_runs — run-length spectrum of the activity calendar
# ---------------------------------------------------------------------------


def q_active_runs(sf_dir: str):
    """(run_len, n_runs): counts of maximal consecutive active-day
    runs by length."""
    ev = _read(sf_dir, "events", ["ts"])

    def days(df: pd.DataFrame) -> pd.DataFrame:
        d = (df["ts"].astype("datetime64[us]").astype("int64")
             // _DAY_US)
        return pd.DataFrame({"day": np.unique(d)})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        d = np.sort(np.unique(df["day"].to_numpy(np.int64)))
        if len(d) == 0:
            return pd.DataFrame({"run_len": pd.Series([], dtype="int64"),
                                 "n_runs": pd.Series([], dtype="int64")})
        grp = d - np.arange(len(d), dtype=np.int64)
        _, counts = np.unique(grp, return_counts=True)
        lens, n = np.unique(counts, return_counts=True)
        return pd.DataFrame({"run_len": lens.astype("int64"),
                             "n_runs": n.astype("int64")})

    return joins.grouped_agg(
        ev.map_batches(days, batch_format="pandas"),
        ["day"], lambda d: d.drop_duplicates(), num_partitions=4,
        pre_repartition=False).repartition(1).map_batches(
        fold, batch_format="pandas", batch_size=None)


_RUNS_SQL = f"""
    WITH d AS (SELECT DISTINCT epoch_us(ts) // {_DAY_US} AS day
               FROM events),
    r AS (SELECT day, day - row_number() OVER (ORDER BY day) AS g
          FROM d),
    runs AS (SELECT count(*)::BIGINT AS run_len FROM r GROUP BY g)
    SELECT run_len, count(*)::BIGINT AS n_runs
    FROM runs GROUP BY run_len
"""


QUERIES = {
    "life_step": q_life_step,
    "active_runs": q_active_runs,
}

ORACLE = {
    "life_step": _life_sql(),
    "active_runs": _RUNS_SQL,
}
