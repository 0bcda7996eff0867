"""Wave-38 catalog: empirical semivariogram bands and multi-touch
attribution position counts.

`semivariogram` is the geostatistics prerequisite to kriging: per
distance band h, the pair count and the exact sum of squared value
differences — gamma(h) = sum_sq / (2 * n_pairs) is the caller's
division. Pairs come from the bucketed `distance_self_join` (grid
blocking + one-sided ghosts, exactly-once formation — never
all-pairs); account balances in exact cents join back onto the
aggregate-sized pair table. Banding uses the pair's ROUNDED
millimeter distance, so the float-free band index matches the SQL
twin bit-for-bit.

`touch_positions` is the multi-touch attribution integer core: for
each converting user (>= 1 purchase), the touches are the events
strictly before the FIRST purchase ((ts, event_id) order); per
event type we count first-touch, last-touch and middle-touch
occurrences across users — the exact counts every weighting scheme
(U-shaped, linear, time-decay) multiplies. Single-touch users count
as first AND last (the standard convention). One user-hash
partition; the oracle replays it with window functions.
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from oluray.functions import geo
from oluray.stages import joins, spatial

SV_RADIUS_M = 600_000.0
SV_BAND_MM = 150_000_000  # 150 km bands on the mm-rounded distance


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# semivariogram — (band, n_pairs, sum_sq) over customer balances
# ---------------------------------------------------------------------------


def q_semivariogram(sf_dir: str):
    """(band, n_pairs, sum_sq): band = dist_mm // 150km-in-mm over
    customer pairs within 600 km; sum_sq = exact squared cents
    difference of account balances."""
    from oluray.pipelines.queries import _round_half_away, _with_points

    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_custkey": df["c_custkey"].astype("int64"),
            "cents": _round_half_away(
                df["c_acctbal"].to_numpy(np.float64) * 100.0)})

    bal = cust.map_batches(cents, batch_format="pandas").materialize()
    pts = _with_points(bal.select_columns(["c_custkey"]), "c_custkey")
    pairs = spatial.distance_self_join(pts, "c_custkey", SV_RADIUS_M,
                                       num_partitions=32)

    j1 = joins.hash_join(
        pairs, bal.map_batches(
            lambda d: d.rename(columns={"c_custkey": "ka",
                                        "cents": "cents_a"}),
            batch_format="pandas"),
        "ka", num_partitions=8)
    j2 = joins.hash_join(
        j1, bal.map_batches(
            lambda d: d.rename(columns={"c_custkey": "kb",
                                        "cents": "cents_b"}),
            batch_format="pandas"),
        "kb", num_partitions=8)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        band = df["dist_mm"].to_numpy(np.int64) // SV_BAND_MM
        diff = (df["cents_a"].to_numpy(np.int64)
                - df["cents_b"].to_numpy(np.int64))
        g = pd.DataFrame({"band": band, "n_pairs": 1,
                          "sum_sq": diff * diff})
        return g.groupby("band", as_index=False).sum()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("band", as_index=False)[["n_pairs",
                                                "sum_sq"]].sum()
        for c in ("band", "n_pairs", "sum_sq"):
            g[c] = g[c].astype("int64")
        return g

    return joins.grouped_agg(
        j2.map_batches(fold, batch_format="pandas"),
        ["band"], final, num_partitions=4, pre_repartition=False)


def _semivariogram_sql() -> str:
    lon, lat = geo.derive_lonlat_sql("c_custkey")
    hav = geo.haversine_sql("a.lon", "a.lat", "b.lon", "b.lat")
    return f"""
    WITH p AS (SELECT c_custkey AS k, {lon} AS lon, {lat} AS lat,
                      round(c_acctbal * 100.0, 0)::BIGINT AS cents
               FROM customer),
    pr AS (
      SELECT round({hav} * 1000.0)::BIGINT AS dist_mm,
             (a.cents - b.cents)::HUGEINT AS d
      FROM p a JOIN p b ON a.k < b.k
      WHERE {hav} < {SV_RADIUS_M!r})
    SELECT (dist_mm // {SV_BAND_MM})::BIGINT AS band,
           count(*)::BIGINT AS n_pairs,
           SUM(d * d)::BIGINT AS sum_sq
    FROM pr GROUP BY 1
    """


# ---------------------------------------------------------------------------
# touch_positions — first/middle/last touch counts per event type
# ---------------------------------------------------------------------------


def q_touch_positions(sf_dir: str):
    """(event_type, n_first, n_last, n_middle) over converting
    users' pre-purchase touch sequences."""
    ev = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "event_type"])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort").reset_index(drop=True)
        rows = []
        for uid, sub in df.groupby("user_id", sort=False):
            et = sub["event_type"].to_numpy()
            pur = np.flatnonzero(et == "purchase")
            if len(pur) == 0 or pur[0] == 0:
                continue  # no conversion, or no touches before it
            touches = et[:pur[0]]
            m = len(touches)
            for i, t in enumerate(touches):
                first = i == 0
                last = i == m - 1
                rows.append((t, int(first), int(last),
                             int(not first and not last)))
        g = pd.DataFrame(rows, columns=["event_type", "n_first",
                                        "n_last", "n_middle"])
        if len(g) == 0:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype="string"),
                "n_first": pd.Series([], dtype="int64"),
                "n_last": pd.Series([], dtype="int64"),
                "n_middle": pd.Series([], dtype="int64")})
        return g.groupby("event_type", as_index=False).sum()

    users = joins.partitioned_map(ev, ["user_id"], per_user,
                                  num_partitions=8)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", as_index=False)[
            ["n_first", "n_last", "n_middle"]].sum()
        for c in ("n_first", "n_last", "n_middle"):
            g[c] = g[c].astype("int64")
        return g

    return joins.grouped_agg(users, ["event_type"], fold,
                             num_partitions=4, pre_repartition=False)


_TOUCH_SQL = """
    WITH r AS (
      SELECT user_id, event_type, ts, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    fp AS (
      SELECT user_id, min(rn) AS prn FROM r
      WHERE event_type = 'purchase' GROUP BY user_id),
    touch AS (
      SELECT r.user_id, r.event_type, r.rn, fp.prn
      FROM r JOIN fp ON r.user_id = fp.user_id
      WHERE r.rn < fp.prn)
    SELECT event_type,
           SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_first,
           SUM(CASE WHEN rn = prn - 1 THEN 1 ELSE 0 END)::BIGINT
             AS n_last,
           SUM(CASE WHEN rn > 1 AND rn < prn - 1 THEN 1 ELSE 0 END)
             ::BIGINT AS n_middle
    FROM touch GROUP BY event_type
"""


QUERIES = {
    "semivariogram": q_semivariogram,
    "touch_positions": q_touch_positions,
}

ORACLE = {
    "semivariogram": _semivariogram_sql(),
    "touch_positions": _TOUCH_SQL,
}
