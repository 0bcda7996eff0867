"""Wave-46 catalog: the activity punchcard.

`punchcard` is the (day-of-week x hour-of-day) activity matrix —
the classic contribution-graph / traffic-shaping rollup: exact
event counts per (dow, hour) cell, dow 0 = Thursday (epoch day 0
convention, matching the SQL twin's arithmetic rather than any
locale). One corpus pass through a per-block combiner; the 168-row
regroup is tiny.
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from oluray.stages import joins

_HOUR_US = 3_600_000_000
_DAY_US = 86_400_000_000


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


def q_punchcard(sf_dir: str):
    """(dow, hour, n_events): dow = epoch_day % 7 (0 = Thursday),
    hour = UTC hour of day."""
    ev = _read(sf_dir, "events", ["ts"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype("int64")
        g = pd.DataFrame({"dow": (us // _DAY_US) % 7,
                          "hour": (us // _HOUR_US) % 24,
                          "n_events": np.ones(len(df),
                                              dtype=np.int64)})
        return g.groupby(["dow", "hour"], as_index=False).sum()

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["dow", "hour"], as_index=False)[
            "n_events"].sum()
        for c in ("dow", "hour", "n_events"):
            g[c] = g[c].astype("int64")
        return g

    return joins.grouped_agg(
        ev.map_batches(combine, batch_format="pandas"),
        ["dow", "hour"], fold, num_partitions=4,
        pre_repartition=False)


_PUNCHCARD_SQL = f"""
    SELECT ((epoch_us(ts) // {_DAY_US}) % 7)::BIGINT AS dow,
           ((epoch_us(ts) // {_HOUR_US}) % 24)::BIGINT AS hour,
           count(*)::BIGINT AS n_events
    FROM events GROUP BY 1, 2
"""


QUERIES = {
    "punchcard": q_punchcard,
}

ORACLE = {
    "punchcard": _PUNCHCARD_SQL,
}
