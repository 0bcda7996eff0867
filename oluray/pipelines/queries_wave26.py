"""Wave-26 catalog: degree assortativity moments, quadtree cell
compaction, and daily-count autocorrelation.

`assortativity` is the network-science mixing statistic (do
high-degree nodes attach to high-degree nodes?): Pearson
correlation of endpoint degrees over the canonical distinct edge
set, reduced to EXACT integer moments (m, sx, sy, sxy, sxx, syy
with both edge orientations counted — the standard symmetrized
form). The single float division is the caller's; moments fold as
Python ints (the `q_group_linreg` discipline — degree products pass
int64 on hub-heavy graphs).

`cell_compact` is the quadtree compaction every tile server ships:
replace any four occupied same-parent res-5 cells by their res-4
parent, recursively to res 2 — the minimal mixed-resolution cover
of the occupied set. The engine's per-level fold runs on the
aggregate lattice (grouped count-4 test per parent); the oracle
unrolls the same three levels in CTEs.

`daily_autocorr` is the periodicity screen on the per-day event
count series: per event type, exact integer moments of the series
against itself shifted one day (n_days, s0, s1, lag dot product,
and the squared sums) — the lag-1 autocorrelation is the caller's
single division. One corpus pass into the (type, day) combiner;
the lag join runs on the aggregate-sized day table.
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
# assortativity — exact degree-mixing moments over the interaction graph
# ---------------------------------------------------------------------------


def q_assortativity(sf_dir: str):
    """One row of exact BIGINT moments (m, sx, sy, sxy, sxx, syy)
    over both orientations of every distinct edge, x = deg(src),
    y = deg(dst). r = (m*sxy - sx*sy) / sqrt((m*sxx - sx^2) *
    (m*syy - sy^2)) is the caller's. Degrees join back to edges via
    two aggregate-sized hash joins — corpus rows never move twice."""
    from oluray.pipelines.queries import _interaction_edges

    e = _interaction_edges(sf_dir)

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        lo = np.minimum(df["a"].to_numpy(), df["b"].to_numpy())
        hi = np.maximum(df["a"].to_numpy(), df["b"].to_numpy())
        return pd.DataFrame({"lo": lo, "hi": hi}).drop_duplicates()

    ce = joins.distinct(
        e.map_batches(canon, batch_format="pandas"), ["lo", "hi"],
        num_partitions=8).materialize()

    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": np.concatenate(
            [df["lo"].to_numpy(np.int64), df["hi"].to_numpy(np.int64)])})

    def dcount(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False).size().rename(
            columns={"size": "deg"})
        g["deg"] = g["deg"].astype("int64")
        return g

    deg = joins.grouped_agg(
        ce.map_batches(endpoints, batch_format="pandas"),
        ["node"], dcount, num_partitions=8, pre_repartition=False)

    # deg(src) onto lo, deg(dst) onto hi; then the symmetric double
    j1 = joins.hash_join(
        ce, deg.map_batches(
            lambda d: d.rename(columns={"node": "lo", "deg": "deg_lo"}),
            batch_format="pandas"),
        "lo", num_partitions=8)
    j2 = joins.hash_join(
        j1, deg.map_batches(
            lambda d: d.rename(columns={"node": "hi", "deg": "deg_hi"}),
            batch_format="pandas"),
        "hi", num_partitions=8)

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({k: pd.array([], dtype="int64") for k in
                                 ("m", "sx", "sy", "sxy", "sxx", "syy")})
        a = df["deg_lo"].to_numpy(np.int64).astype(object)
        b = df["deg_hi"].to_numpy(np.int64).astype(object)
        # both orientations: (a,b) and (b,a)
        return pd.DataFrame({
            "m": [2 * len(df)], "sx": [int((a + b).sum())],
            "sy": [int((a + b).sum())],
            "sxy": [int(2 * (a * b).sum())],
            "sxx": [int((a * a + b * b).sum())],
            "syy": [int((a * a + b * b).sum())]})

    parts = j2.map_batches(moments, batch_format="pandas").to_pandas()
    parts = parts.astype(object)
    tot = parts.sum()
    return pd.DataFrame([{k: int(tot[k]) for k in
                          ("m", "sx", "sy", "sxy", "sxx", "syy")}])


def _assort_sql() -> str:
    from oluray.pipelines.queries_wave22 import _EDGES_CTE

    return f"""
    WITH {_EDGES_CTE},
    canon AS (SELECT DISTINCT LEAST(a, b) AS lo, GREATEST(a, b) AS hi
              FROM edges),
    deg AS (SELECT node, count(*)::HUGEINT AS deg FROM (
              SELECT lo AS node FROM canon
              UNION ALL SELECT hi FROM canon) GROUP BY node),
    pairs AS (
      SELECT dl.deg AS x, dh.deg AS y
      FROM canon JOIN deg dl ON dl.node = canon.lo
                 JOIN deg dh ON dh.node = canon.hi
      UNION ALL
      SELECT dh.deg, dl.deg
      FROM canon JOIN deg dl ON dl.node = canon.lo
                 JOIN deg dh ON dh.node = canon.hi)
    SELECT count(*)::BIGINT AS m, SUM(x)::BIGINT AS sx,
           SUM(y)::BIGINT AS sy, SUM(x * y)::BIGINT AS sxy,
           SUM(x * x)::BIGINT AS sxx, SUM(y * y)::BIGINT AS syy
    FROM pairs
    """


# ---------------------------------------------------------------------------
# cell_compact — quadtree compaction of the occupied cell set
# ---------------------------------------------------------------------------

COMPACT_LEAF_RES = 5
COMPACT_TOP_RES = 2


def _compact_levels(df: pd.DataFrame) -> pd.DataFrame:
    """Aggregate-sized fold: per level, parents with all 4 children
    present replace them; survivors emit at their level. Module-level
    so pytest drives the production kernel. Input (cell,) at
    COMPACT_LEAF_RES; output (cell, res)."""
    cur = df["cell"].to_numpy(np.int64)
    out_cells, out_res = [], []
    res = COMPACT_LEAF_RES
    while res > COMPACT_TOP_RES and len(cur):
        rem = cur - np.int64(res) * np.int64(geo.RES_SHIFT)
        y, x = rem // np.int64(geo.Y_SHIFT), rem % np.int64(geo.Y_SHIFT)
        px, py = x // 2, y // 2
        parent = (np.int64(res - 1) * np.int64(geo.RES_SHIFT)
                  + py * np.int64(geo.Y_SHIFT) + px)
        u, inv, cnt = np.unique(parent, return_inverse=True,
                                return_counts=True)
        full = cnt[inv] == 4
        out_cells.append(cur[~full])
        out_res.append(np.full(int((~full).sum()), res, dtype=np.int64))
        cur = u[cnt == 4]
        res -= 1
    out_cells.append(cur)
    out_res.append(np.full(len(cur), res, dtype=np.int64))
    return pd.DataFrame({"cell": np.concatenate(out_cells),
                         "res": np.concatenate(out_res)})


def q_cell_compact(sf_dir: str):
    """(cell, res): minimal mixed-resolution cover of the occupied
    res-5 event-cell set, compacting full sibling quads up to res 2.
    Corpus passes once through the occupied-cell combiner; the level
    folds run on the 4^res lattice (per-parent grouped count beyond
    one worker)."""
    from oluray.pipelines.queries_wave18 import _event_cell_counts

    counts = _event_cell_counts(sf_dir, COMPACT_LEAF_RES)
    return counts.repartition(1).map_batches(
        _compact_levels, batch_format="pandas", batch_size=None)


def _compact_sql() -> str:
    lon, lat = geo.derive_lonlat_sql("event_id")
    x, y = geo.cell_xy_sql(lon, lat, COMPACT_LEAF_RES)
    S, Y = geo.RES_SHIFT, geo.Y_SHIFT
    return f"""
    WITH l5 AS (
      SELECT DISTINCT x, y
      FROM (SELECT {x} AS x, {y} AS y FROM events)),
    p5 AS (SELECT x // 2 AS x, y // 2 AS y FROM l5
           GROUP BY x // 2, y // 2 HAVING count(*) = 4),
    k5 AS (SELECT x, y FROM l5 t WHERE NOT EXISTS (
             SELECT 1 FROM p5 WHERE p5.x = t.x // 2
                                AND p5.y = t.y // 2)),
    p4 AS (SELECT x // 2 AS x, y // 2 AS y FROM p5
           GROUP BY x // 2, y // 2 HAVING count(*) = 4),
    k4 AS (SELECT x, y FROM p5 t WHERE NOT EXISTS (
             SELECT 1 FROM p4 WHERE p4.x = t.x // 2
                                AND p4.y = t.y // 2)),
    p3 AS (SELECT x // 2 AS x, y // 2 AS y FROM p4
           GROUP BY x // 2, y // 2 HAVING count(*) = 4),
    k3 AS (SELECT x, y FROM p4 t WHERE NOT EXISTS (
             SELECT 1 FROM p3 WHERE p3.x = t.x // 2
                                AND p3.y = t.y // 2))
    SELECT (5 * {S} + y * {Y} + x) AS cell, 5::BIGINT AS res FROM k5
    UNION ALL
    SELECT (4 * {S} + y * {Y} + x), 4 FROM k4
    UNION ALL
    SELECT (3 * {S} + y * {Y} + x), 3 FROM k3
    UNION ALL
    SELECT (2 * {S} + y * {Y} + x), 2 FROM p3
    """


# ---------------------------------------------------------------------------
# daily_autocorr — lag-1 autocovariance moments of daily counts
# ---------------------------------------------------------------------------


def q_daily_autocorr(sf_dir: str):
    """(event_type, n_days, s0, s1, dot, ss0, ss1): exact moments of
    the per-day count series c against its one-day shift — only
    ADJACENT day pairs (day, day+1) both present contribute to the
    pair moments (missing days break the lag chain, matching the SQL
    join). r1 = (n*dot - s0*s1)/sqrt((n*ss0 - s0^2)(n*ss1 - s1^2))
    over the n paired days is the caller's."""
    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["ts"].astype("datetime64[us]").astype("int64")
               // 86_400_000_000)
        g = pd.DataFrame({"event_type": df["event_type"], "day": day,
                          "c": np.ones(len(df), dtype=np.int64)})
        return g.groupby(["event_type", "day"], as_index=False)["c"] \
            .sum()

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["event_type", "day"], as_index=False)["c"].sum()
        rows = []
        for et, sub in g.groupby("event_type", sort=False):
            sub = sub.sort_values("day")
            d = sub["day"].to_numpy(np.int64)
            c = sub["c"].to_numpy(np.int64).astype(object)
            adj = d[1:] == d[:-1] + 1
            c0, c1 = c[:-1][adj], c[1:][adj]
            rows.append((et, int(adj.sum()), int(c0.sum()),
                         int(c1.sum()), int((c0 * c1).sum()),
                         int((c0 * c0).sum()), int((c1 * c1).sum())))
        return pd.DataFrame(rows, columns=["event_type", "n_days",
                                           "s0", "s1", "dot", "ss0",
                                           "ss1"])

    return joins.grouped_agg(ev, ["event_type"], fold,
                             num_partitions=4, combine_fn=combine)


_AUTOCORR_SQL = """
    WITH c AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             count(*)::HUGEINT AS c
      FROM events GROUP BY event_type, day),
    p AS (
      SELECT a.event_type, a.c AS c0, b.c AS c1
      FROM c a JOIN c b
        ON a.event_type = b.event_type AND b.day = a.day + 1)
    SELECT event_type, count(*)::BIGINT AS n_days,
           SUM(c0)::BIGINT AS s0, SUM(c1)::BIGINT AS s1,
           SUM(c0 * c1)::BIGINT AS dot, SUM(c0 * c0)::BIGINT AS ss0,
           SUM(c1 * c1)::BIGINT AS ss1
    FROM p GROUP BY event_type
"""


QUERIES = {
    "assortativity": q_assortativity,
    "cell_compact": q_cell_compact,
    "daily_autocorr": q_daily_autocorr,
}

ORACLE = {
    "assortativity": _assort_sql(),
    "cell_compact": _compact_sql(),
    "daily_autocorr": _AUTOCORR_SQL,
}
