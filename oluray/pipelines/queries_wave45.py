"""Wave-45 catalog: sliding-window peak load.

`peak_window` is the peak-RPS / surge-capacity statistic: per event
type, the maximum number of events inside any sliding 1-hour
window, with the earliest achieving anchor (windows anchored at
event timestamps — the standard discretization: a maximizing window
can always slide left until its left edge touches an event).
Per-type partition, one sort, one vectorized two-pointer
(searchsorted of ts+1h against the sorted ts array); the oracle
anchors the same windows with a range self-join.
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from oluray.stages import joins

_WIN_US = 3_600_000_000  # 1 hour


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


def q_peak_window(sf_dir: str):
    """(event_type, peak_n, anchor_us): the busiest [t, t+1h) window
    per type, anchored at event times, earliest anchor on ties."""
    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, sub in df.groupby("event_type", sort=False):
            ts = np.sort(sub["ts"].astype("datetime64[us]")
                         .astype("int64").to_numpy())
            # count of events in [ts[i], ts[i]+WIN) for every anchor i
            hi = np.searchsorted(ts, ts + _WIN_US, side="left")
            n = hi - np.arange(len(ts))
            best = int(n.max())
            anchor = int(ts[int(np.argmax(n))])  # first max = earliest
            rows.append((et, best, anchor))
        return pd.DataFrame(rows, columns=["event_type", "peak_n",
                                           "anchor_us"])

    return joins.grouped_agg(ev, ["event_type"], fold,
                             num_partitions=4)


_PEAK_SQL = f"""
    WITH e AS (SELECT event_type, epoch_us(ts) AS t FROM events),
    w AS (
      SELECT a.event_type, a.t AS anchor,
             count(*)::BIGINT AS n
      FROM e a JOIN e b
        ON a.event_type = b.event_type
       AND b.t >= a.t AND b.t < a.t + {_WIN_US}
      GROUP BY a.event_type, a.t)
    SELECT event_type, n AS peak_n, anchor AS anchor_us FROM w
    QUALIFY row_number() OVER (PARTITION BY event_type
                               ORDER BY n DESC, anchor) = 1
"""


QUERIES = {
    "peak_window": q_peak_window,
}

ORACLE = {
    "peak_window": _PEAK_SQL,
}
