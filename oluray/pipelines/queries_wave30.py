"""Wave-30 catalog: rapid-reorder detection and temporal drift
components.

`rapid_reorders` is the order-velocity screen (card-testing /
duplicate-submission fraud): pairs of orders from the SAME customer
at most 7 days apart. Pair formation is bucketed by customer — only
one customer's orders ever meet in a task, and the within-group
sweep breaks off at the sorted 7-day horizon, the same
exactly-once pair discipline as `distance_pairs`; output is the
ordered pair (earlier first, ties by key).

`temporal_drift` is `spatial_drift`'s time sibling: per res-4
cell, event counts in the EARLY vs LATE half of the observed time
range (split at the integer midpoint of [min_us, max_us)) plus the
exact signed contingency component d = n_e*T_l - n_l*T_e — the
"did the spatial distribution shift over time" screen. Two tiny
global aggregates (min/max ts) then one corpus pass.
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
# rapid_reorders — same customer, orders within 7 days
# ---------------------------------------------------------------------------

DUP_WINDOW_DAYS = 7


def q_rapid_reorders(sf_dir: str):
    """(o1, o2, o_custkey, day_gap) for order pairs of one customer
    at most 7 days apart, o1 < o2 by key. Pairs form per custkey
    hash partition; the sorted-day sweep breaks at the horizon, so
    work is pairs-output-proportional, never quadratic in a
    customer's full history."""
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "o_custkey": df["o_custkey"].astype("int64"),
            "day": df["o_orderdate"].astype("datetime64[us]")
                .astype("int64") // 86_400_000_000})

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for ck, sub in df.groupby("o_custkey", sort=False):
            if len(sub) < 2:
                continue
            sub = sub.sort_values(["day", "o_orderkey"])
            d = sub["day"].to_numpy(np.int64)
            k = sub["o_orderkey"].to_numpy(np.int64)
            for i in range(len(sub)):
                for jj in range(i + 1, len(sub)):
                    gap = int(d[jj] - d[i])
                    if gap > DUP_WINDOW_DAYS:
                        break
                    a, b = int(k[i]), int(k[jj])
                    if a > b:
                        a, b = b, a
                    out.append((a, b, int(ck), gap))
        return pd.DataFrame(out, columns=["o1", "o2", "o_custkey",
                                          "day_gap"]) \
            .astype("int64", errors="ignore")

    prepped = orders.map_batches(prep, batch_format="pandas")
    return joins.partitioned_map(prepped, ["o_custkey"],
                                 pairs, num_partitions=16)


_DUP_SQL = f"""
    WITH o AS (
      SELECT o_orderkey AS k, o_custkey AS ck,
             epoch_us(o_orderdate::TIMESTAMP) // 86400000000 AS day
      FROM orders)
    SELECT LEAST(a.k, b.k)::BIGINT AS o1,
           GREATEST(a.k, b.k)::BIGINT AS o2,
           a.ck AS o_custkey,
           abs(a.day - b.day)::BIGINT AS day_gap
    FROM o a JOIN o b
      ON a.ck = b.ck
     AND (a.day < b.day OR (a.day = b.day AND a.k < b.k))
     AND b.day - a.day <= {DUP_WINDOW_DAYS}
"""


# ---------------------------------------------------------------------------
# temporal_drift — early-vs-late per-cell contingency components
# ---------------------------------------------------------------------------

TDRIFT_RES = 4


def q_temporal_drift(sf_dir: str):
    """(cell, n_early, n_late, d): early = ts_us < (min+max)//2 of
    the observed range; d = n_early*T_late - n_late*T_early exact."""
    from oluray.pipelines.queries import _with_points

    ev = _read(sf_dir, "events", ["event_id", "ts"])

    def usmin(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"lo": pd.array([], dtype="int64"),
                                 "hi": pd.array([], dtype="int64")})
        us = df["ts"].astype("datetime64[us]").astype("int64")
        return pd.DataFrame({"lo": [int(us.min())],
                             "hi": [int(us.max())]})

    ext = ev.map_batches(usmin, batch_format="pandas").to_pandas()
    mid = (int(ext["lo"].min()) + int(ext["hi"].max())) // 2

    pts = _with_points(ev, "event_id")

    def cells(t: pa.Table) -> pa.Table:
        c = geo.cell_encode(
            t["lon"].to_numpy(zero_copy_only=False),
            t["lat"].to_numpy(zero_copy_only=False), TDRIFT_RES)
        us = t["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        early = us < mid
        df = pd.DataFrame({"cell": c,
                           "n_early": early.astype("int64"),
                           "n_late": (~early).astype("int64")})
        return pa.Table.from_pandas(
            df.groupby("cell", as_index=False).sum(),
            preserve_index=False)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cell", as_index=False)[["n_early",
                                                "n_late"]].sum()
        for c in ("cell", "n_early", "n_late"):
            g[c] = g[c].astype("int64")
        return g

    agg = joins.grouped_agg(
        pts.map_batches(cells, batch_format="pyarrow"),
        ["cell"], fold, num_partitions=8,
        pre_repartition=False).materialize()
    t_e = int(agg.sum("n_early") or 0)
    t_l = int(agg.sum("n_late") or 0)

    def comp(t: pa.Table) -> pa.Table:
        ne = t["n_early"].to_numpy(zero_copy_only=False)
        nl = t["n_late"].to_numpy(zero_copy_only=False)
        return pa.table({"cell": t["cell"], "n_early": t["n_early"],
                         "n_late": t["n_late"],
                         "d": pa.array(ne * np.int64(t_l)
                                       - nl * np.int64(t_e))})

    return agg.map_batches(comp, batch_format="pyarrow")


def _tdrift_sql() -> str:
    lon, lat = geo.derive_lonlat_sql("event_id")
    cell = geo.cell_encode_sql(lon, lat, TDRIFT_RES)
    return f"""
    WITH m AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2
                 AS mid FROM events),
    c AS (
      SELECT cell,
             SUM(CASE WHEN us < m.mid THEN 1 ELSE 0 END)::BIGINT
               AS n_early,
             SUM(CASE WHEN us < m.mid THEN 0 ELSE 1 END)::BIGINT
               AS n_late
      FROM (SELECT {cell} AS cell, epoch_us(ts) AS us FROM events), m
      GROUP BY cell),
    t AS (SELECT SUM(n_early)::HUGEINT AS te,
                 SUM(n_late)::HUGEINT AS tl FROM c)
    SELECT cell, n_early, n_late,
           (n_early::HUGEINT * t.tl - n_late::HUGEINT * t.te)::BIGINT
             AS d
    FROM c, t
    """


QUERIES = {
    "rapid_reorders": q_rapid_reorders,
    "temporal_drift": q_temporal_drift,
}

ORACLE = {
    "rapid_reorders": _DUP_SQL,
    "temporal_drift": _tdrift_sql(),
}
