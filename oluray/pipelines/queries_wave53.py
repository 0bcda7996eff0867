"""Wave-53 catalog: activity selection and the longest increasing
subsequence.

`max_meetings` is the interval-scheduling classic (the provably
optimal earliest-deadline greedy): per user, the maximum number of
non-overlapping 30-minute activity windows selectable from their
events (window = [ts, ts+30min); next selected window must start
at or after the previous end). Per-user partition, one sorted
greedy sweep. Rows-only (the greedy recurrence is not SQL);
brute-verified against an exponential optimal search on small
cases.

`lis_length` is the longest STRICTLY increasing subsequence of the
daily event-count series — the patience-sorting O(n log n) bound on
monotone trend structure (the combinatorial cousin of `trend_test`
and `theil_sen`). One aggregate-sized task; rows-only, verified
against the O(n^2) DP.
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from oluray.stages import joins

_DAY_US = 86_400_000_000
MEET_WIN_US = 1_800_000_000  # 30 minutes


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# max_meetings — earliest-end greedy per user
# ---------------------------------------------------------------------------


def greedy_meetings(ts_sorted: np.ndarray) -> int:
    """Max non-overlapping [t, t+WIN) windows from sorted starts.
    Equal-end/start touching (next start == previous end) is
    allowed."""
    cnt = 0
    free_at = -(1 << 62)
    for t in ts_sorted.tolist():
        if t >= free_at:
            cnt += 1
            free_at = t + MEET_WIN_US
    return cnt


def q_max_meetings(sf_dir: str):
    """(user_id, n_events, n_meetings)."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        rows = []
        for uid, sub in df.groupby("user_id", sort=False):
            ts = sub["ts"].astype("datetime64[us]").astype("int64") \
                .to_numpy()
            rows.append((int(uid), len(ts), greedy_meetings(ts)))
        return pd.DataFrame(rows, columns=["user_id", "n_events",
                                           "n_meetings"])

    return joins.partitioned_map(ev, ["user_id"], per_user,
                                 num_partitions=8)


# ---------------------------------------------------------------------------
# lis_length — patience sorting on daily counts
# ---------------------------------------------------------------------------


def lis_length(vals: np.ndarray) -> int:
    """Longest strictly increasing subsequence via patience piles
    (bisect_left on pile tops)."""
    import bisect

    piles: list[int] = []
    for v in vals.tolist():
        i = bisect.bisect_left(piles, v)
        if i == len(piles):
            piles.append(v)
        else:
            piles[i] = v
    return len(piles)


def q_lis_length(sf_dir: str):
    """One row (n_days, lis) over the day-ordered count series."""
    ev = _read(sf_dir, "events", ["ts"])

    def days(df: pd.DataFrame) -> pd.DataFrame:
        d = (df["ts"].astype("datetime64[us]").astype("int64")
             // _DAY_US)
        g = pd.DataFrame({"day": d,
                          "c": np.ones(len(df), dtype=np.int64)})
        return g.groupby("day", as_index=False)["c"].sum()

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("day", as_index=False)["c"].sum()
        g["day"] = g["day"].astype("int64")
        g["c"] = g["c"].astype("int64")
        return g

    agg = joins.grouped_agg(
        ev.map_batches(days, batch_format="pandas"),
        ["day"], fold, num_partitions=4, pre_repartition=False)

    def run(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("day").reset_index(drop=True)
        return pd.DataFrame([{
            "n_days": len(df),
            "lis": lis_length(df["c"].to_numpy(np.int64))}])

    return agg.repartition(1).map_batches(run, batch_format="pandas",
                                          batch_size=None)


QUERIES = {
    "max_meetings": q_max_meetings,
    "lis_length": q_lis_length,
}

ORACLE = {}
