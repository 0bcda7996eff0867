"""Wave-50 catalog: maximum drawdown.

`max_drawdown` is the finance risk classic on the cumulative daily
event-value series (exact cents): D = max over days of
(running peak - cumulative), with the FIRST trough day achieving D
and the FIRST day attaining that trough's running peak — all
deterministic, all BIGINT. The day series is aggregate-sized; the
scan is one vectorized task. The oracle replays it with running
windows and QUALIFY.
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from oluray.stages import joins

_DAY_US = 86_400_000_000


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


def _dd_fold(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized drawdown scan over the day-sorted cents series.
    Module-level so pytest drives the production kernel."""
    df = df.sort_values("day").reset_index(drop=True)
    d = df["day"].to_numpy(np.int64)
    cum = np.cumsum(df["cents"].to_numpy(np.int64).astype(object))
    peak = np.maximum.accumulate(cum)
    dd = peak - cum
    D = int(max(dd)) if len(dd) else 0
    if len(dd) == 0:
        return pd.DataFrame([{"drawdown_cents": 0, "peak_day": -1,
                              "trough_day": -1}])
    trough_i = int(np.argmax(np.array([int(v) for v in dd])))
    # first day attaining the trough's running peak
    pk = int(peak[trough_i])
    peak_i = int(np.flatnonzero(
        np.array([int(v) for v in cum]) == pk)[0])
    return pd.DataFrame([{"drawdown_cents": D,
                          "peak_day": int(d[peak_i]),
                          "trough_day": int(d[trough_i])}])


def q_max_drawdown(sf_dir: str):
    """One row (drawdown_cents, peak_day, trough_day) over the
    cumulative daily sum of event values (cents)."""
    from oluray.pipelines.queries import _round_half_away

    ev = _read(sf_dir, "events", ["ts", "value"])

    def days(df: pd.DataFrame) -> pd.DataFrame:
        d = (df["ts"].astype("datetime64[us]").astype("int64")
             // _DAY_US)
        g = pd.DataFrame({"day": d,
                          "cents": _round_half_away(
                              df["value"].to_numpy(np.float64)
                              * 100.0)})
        return g.groupby("day", as_index=False)["cents"].sum()

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("day", as_index=False)["cents"].sum()
        g["day"] = g["day"].astype("int64")
        g["cents"] = g["cents"].astype("int64")
        return g

    agg = joins.grouped_agg(
        ev.map_batches(days, batch_format="pandas"),
        ["day"], fold, num_partitions=4, pre_repartition=False)
    return agg.repartition(1).map_batches(
        _dd_fold, batch_format="pandas", batch_size=None)


_DD_SQL = f"""
    WITH d AS (
      SELECT epoch_us(ts) // {_DAY_US} AS day,
             SUM(round(value * 100.0, 0)::BIGINT)::BIGINT AS cents
      FROM events GROUP BY 1),
    w AS (
      SELECT day,
             SUM(cents) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM d),
    p AS (SELECT day, cum,
                 max(cum) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS peak
          FROM w),
    t AS (SELECT day AS trough_day, (peak - cum)::BIGINT AS dd, peak
          FROM p QUALIFY row_number() OVER (
            ORDER BY peak - cum DESC, day) = 1)
    SELECT t.dd AS drawdown_cents,
           (SELECT min(day) FROM p WHERE p.cum = t.peak)::BIGINT
             AS peak_day,
           t.trough_day::BIGINT AS trough_day
    FROM t
"""


QUERIES = {
    "max_drawdown": q_max_drawdown,
}

ORACLE = {
    "max_drawdown": _DD_SQL,
}
