"""Wave-25 catalog: per-cell Herfindahl concentration, Mann-Kendall
trend test, and greedy max-coverage facility selection.

`cell_diversity` is the concentration/diversity index (Herfindahl-
Hirschman in economics, Simpson's index in ecology) per spatial
cell: with per-type counts n_i and cell total n, HHI = sum(n_i^2)
/ n^2 — emitted as the exact rational (hhi_num, hhi_den) plus the
type count. One corpus pass through a (cell, type) combiner; the
square-fold runs on the aggregate lattice.

`trend_test` is the Mann-Kendall monotone-trend statistic per event
type: S = #concordant - #discordant over all time-ordered pairs
(value ties and time ties contribute 0) — THE nonparametric trend
detector for environmental series. S is exact integer; the engine
counts pairs in chunked vectorized blocks (the classical O(n^2)
pair definition, the published bound — at series beyond ~1e5 the
merge-based inversion count slots into the same fold). The oracle
is the literal pairwise self-join.

`set_cover_greedy` is the greedy max-coverage heuristic (facility
placement, sensor siting — the canonical (1-1/e) approximation):
facilities are occupied res-4 cells covering their 3x3
neighborhood's events; repeatedly pick the cell with the largest
uncovered-event gain (ties: smaller cell id) until coverage >= half
the corpus. Runs on the aggregate-sized lattice in one task;
rows-only (iterative argmax is not SQL); brute-verified in pytest.
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
# cell_diversity — Herfindahl / Simpson concentration per cell
# ---------------------------------------------------------------------------

DIV_RES = 4


def q_cell_diversity(sf_dir: str):
    """(cell, n_types, hhi_num, hhi_den): event-type concentration
    per res-4 cell as an exact rational."""
    from oluray.pipelines.queries import _with_points

    ev = _read(sf_dir, "events", ["event_id", "event_type"])
    pts = _with_points(ev, "event_id")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        lon = df["lon"].to_numpy(np.float64)
        lat = df["lat"].to_numpy(np.float64)
        g = pd.DataFrame({"cell": geo.cell_encode(lon, lat, DIV_RES),
                          "event_type": df["event_type"],
                          "n": np.ones(len(df), dtype=np.int64)})
        return g.groupby(["cell", "event_type"], as_index=False)["n"] \
            .sum()

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["cell", "event_type"], as_index=False)["n"].sum()
        rows = []
        for cell, sub in g.groupby("cell", sort=False):
            n_i = sub["n"].to_numpy(np.int64)
            n = int(n_i.sum())
            rows.append((int(cell), len(n_i), int((n_i * n_i).sum()),
                         n * n))
        return pd.DataFrame(rows, columns=["cell", "n_types",
                                           "hhi_num", "hhi_den"])

    return joins.grouped_agg(
        pts.map_batches(combine, batch_format="pandas"),
        ["cell"], fold, num_partitions=8, pre_repartition=False)


def _diversity_sql() -> str:
    lon, lat = geo.derive_lonlat_sql("event_id")
    cell = geo.cell_encode_sql(lon, lat, DIV_RES)
    return f"""
    WITH c AS (
      SELECT cell, event_type, count(*)::BIGINT AS n
      FROM (SELECT {cell} AS cell, event_type FROM events)
      GROUP BY cell, event_type)
    SELECT cell, count(*)::BIGINT AS n_types,
           SUM(n * n)::BIGINT AS hhi_num,
           (SUM(n) * SUM(n))::BIGINT AS hhi_den
    FROM c GROUP BY cell
    """


# ---------------------------------------------------------------------------
# trend_test — Mann-Kendall S per event type
# ---------------------------------------------------------------------------


def _mk_s(ts: np.ndarray, val: np.ndarray) -> int:
    """Exact Mann-Kendall S over pairs ordered by (ts): sign(v_j -
    v_i) summed over ts_i < ts_j (time ties contribute 0). Chunked
    vectorized pair sweep — the classical O(n^2) definition."""
    order = np.argsort(ts, kind="stable")
    t, v = ts[order], val[order]
    n = len(v)
    s = 0
    CH = 512
    for lo in range(0, n, CH):
        hi = min(lo + CH, n)
        # pairs (i < j) with i in [0, hi), j in [lo, hi): compare
        # every j-block against all earlier rows
        vj = v[lo:hi]
        tj = t[lo:hi]
        vi = v[:hi]
        ti = t[:hi]
        gt = (vj[None, :] > vi[:, None])
        lt = (vj[None, :] < vi[:, None])
        valid = (ti[:, None] < tj[None, :])
        s += int(gt[valid].sum()) - int(lt[valid].sum())
    return s


def q_trend_test(sf_dir: str):
    """(event_type, n, s): Mann-Kendall trend statistic of value over
    time per event type. Groups partition by type; the pair sweep
    runs inside the per-type task."""
    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, sub in df.groupby("event_type", sort=False):
            ts = sub["ts"].astype("datetime64[us]").astype("int64") \
                .to_numpy()
            val = sub["value"].to_numpy(np.float64)
            rows.append((et, len(sub), _mk_s(ts, val)))
        return pd.DataFrame(rows, columns=["event_type", "n", "s"])

    return joins.grouped_agg(ev, ["event_type"], fold,
                             num_partitions=4)


_TREND_SQL = """
    WITH e AS (SELECT event_type, epoch_us(ts) AS t, value AS v
               FROM events)
    SELECT a.event_type,
           (SELECT count(*) FROM e x
            WHERE x.event_type = a.event_type)::BIGINT AS n,
           SUM(CASE WHEN b.v > a.v THEN 1
                    WHEN b.v < a.v THEN -1 ELSE 0 END)::BIGINT AS s
    FROM e a JOIN e b
      ON a.event_type = b.event_type AND a.t < b.t
    GROUP BY a.event_type
"""


# ---------------------------------------------------------------------------
# set_cover_greedy — max-coverage facility selection
# ---------------------------------------------------------------------------

COVER_RES = 4


def _greedy_cover(df: pd.DataFrame) -> pd.DataFrame:
    """Single aggregate-sized task: greedy 3x3-neighborhood coverage
    until >= 50% of events covered. Module-level so pytest drives the
    production kernel. Input is the (cell, v) occupied-count table
    (`_event_cell_counts` schema)."""
    n_grid = 1 << COVER_RES
    cnt = np.zeros((n_grid, n_grid), dtype=np.int64)
    if len(df):
        _, x, y = geo.cell_decode(df["cell"].to_numpy(np.int64))
        cnt[y, x] = df["v"].to_numpy(np.int64)
    total = int(cnt.sum())
    target = (total + 1) // 2
    covered = np.zeros((n_grid, n_grid), dtype=bool)
    rows = []
    cum = 0
    occ = np.argwhere(cnt > 0)  # candidate facilities (y, x)
    while cum < target and len(occ):
        best_gain, best_yx = -1, None
        for fy, fx in occ:
            y0, y1 = max(fy - 1, 0), min(fy + 2, n_grid)
            x0, x1 = max(fx - 1, 0), min(fx + 2, n_grid)
            gain = int(cnt[y0:y1, x0:x1][~covered[y0:y1, x0:x1]].sum())
            if gain > best_gain:
                best_gain, best_yx = gain, (int(fy), int(fx))
            elif gain == best_gain and best_yx is not None:
                # tie: smaller cell id = smaller (y, x)
                if (int(fy), int(fx)) < best_yx:
                    best_yx = (int(fy), int(fx))
        if best_gain <= 0:
            break
        fy, fx = best_yx
        y0, y1 = max(fy - 1, 0), min(fy + 2, n_grid)
        x0, x1 = max(fx - 1, 0), min(fx + 2, n_grid)
        covered[y0:y1, x0:x1] = True
        cum += best_gain
        cell = int(np.int64(COVER_RES) * np.int64(geo.RES_SHIFT)
                   + np.int64(fy) * np.int64(geo.Y_SHIFT)
                   + np.int64(fx))
        rows.append((len(rows) + 1, cell, best_gain, cum))
    return pd.DataFrame(rows, columns=["step", "cell", "gain",
                                       "cum_covered"])


def q_set_cover_greedy(sf_dir: str):
    """(step, cell, gain, cum_covered): greedy facility picks until
    half the events are covered. Corpus passes once through the
    cell-count combiner; greedy runs on the 4^res lattice."""
    from oluray.pipelines.queries_wave18 import _event_cell_counts

    counts = _event_cell_counts(sf_dir, COVER_RES)
    return counts.repartition(1).map_batches(
        _greedy_cover, batch_format="pandas", batch_size=None)


QUERIES = {
    "cell_diversity": q_cell_diversity,
    "trend_test": q_trend_test,
    "set_cover_greedy": q_set_cover_greedy,
}

ORACLE = {
    "cell_diversity": _diversity_sql(),
    "trend_test": _TREND_SQL,
}
