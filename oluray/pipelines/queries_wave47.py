"""Wave-47 catalog: ABC inventory classification and the stock
span.

`abc_class` is the warehouse ABC analysis (the per-item
classification behind `pareto_point`'s single cut): parts sorted by
exact cents revenue (descending, partkey tiebreak) are labeled A
while the running total stays under 80% of grand total, B under
95%, else C — thresholds compared cross-multiplied, no float
share. The ranked cumulative runs on the aggregate per-part table.

`stock_span` is the monotone-stack classic on the daily series:
for every active day, the number of days back to (and excluding)
the most recent STRICTLY higher count — "days since a higher
high", the momentum indicator. The engine's stack sweep is
O(n) on the aggregate-sized day series; the oracle uses the
correlated max-lookback subquery.
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from oluray.stages import joins

_DAY_US = 86_400_000_000
ABC_A_NUM, ABC_A_DEN = 4, 5     # A: cum <= 80%
ABC_B_NUM, ABC_B_DEN = 19, 20   # B: cum <= 95%


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# abc_class — per-part A/B/C revenue classification
# ---------------------------------------------------------------------------


def q_abc_class(sf_dir: str):
    """(l_partkey, abc): class by running revenue share — A while
    DEN*cum <= NUM*total at 80%, B at 95%, else C (the row that
    CROSSES a boundary belongs to the lower class)."""
    from oluray.pipelines.queries import _round_half_away

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount"])

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        rev = _round_half_away(
            df["l_extendedprice"].to_numpy(np.float64)
            * (1.0 - df["l_discount"].to_numpy(np.float64)) * 100.0)
        g = pd.DataFrame({"l_partkey": df["l_partkey"].astype("int64"),
                          "rev": rev})
        return g.groupby("l_partkey", as_index=False)["rev"].sum()

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_partkey", as_index=False)["rev"].sum()
        g["rev"] = g["rev"].astype("int64")
        return g

    rev = joins.grouped_agg(
        li.map_batches(cents, batch_format="pandas"),
        ["l_partkey"], fold, num_partitions=8,
        pre_repartition=False)

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["rev", "l_partkey"],
                            ascending=[False, True]).reset_index(
            drop=True)
        r = df["rev"].to_numpy(np.int64).astype(object)
        cum = np.cumsum(r)
        total = int(cum[-1]) if len(cum) else 0
        a = np.array([ABC_A_DEN * int(c) <= ABC_A_NUM * total
                      for c in cum])
        b = np.array([ABC_B_DEN * int(c) <= ABC_B_NUM * total
                      for c in cum])
        cls = np.where(a, "A", np.where(b, "B", "C"))
        return pd.DataFrame({"l_partkey": df["l_partkey"]
                             .astype("int64"),
                             "abc": pd.array(cls, dtype="string")})

    # per-part table is the aggregate; the ranked classify is one
    # task (histogram-offset ranks are the beyond-worker path)
    return rev.repartition(1).map_batches(
        classify, batch_format="pandas", batch_size=None)


_ABC_SQL = f"""
    WITH r AS (
      SELECT l_partkey,
             SUM(round(l_extendedprice * (1.0 - l_discount) * 100.0,
                       0)::BIGINT)::BIGINT AS rev
      FROM lineitem GROUP BY l_partkey),
    w AS (
      SELECT l_partkey, rev,
             SUM(rev) OVER (ORDER BY rev DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               ::HUGEINT AS cum,
             (SELECT SUM(rev) FROM r)::HUGEINT AS total
      FROM r)
    SELECT l_partkey,
           CASE WHEN {ABC_A_DEN} * cum <= {ABC_A_NUM} * total
                  THEN 'A'
                WHEN {ABC_B_DEN} * cum <= {ABC_B_NUM} * total
                  THEN 'B'
                ELSE 'C' END AS abc
    FROM w
"""


# ---------------------------------------------------------------------------
# stock_span — days since a strictly higher daily count
# ---------------------------------------------------------------------------


def _span_fold(df: pd.DataFrame) -> pd.DataFrame:
    """O(n) monotone-stack span over the day-sorted series.
    Module-level so pytest drives the production kernel. span =
    day - (day of most recent strictly-higher count), or
    day - first_day + 1 when none exists."""
    df = df.sort_values("day").reset_index(drop=True)
    d = df["day"].to_numpy(np.int64)
    c = df["c"].to_numpy(np.int64)
    spans = np.zeros(len(d), dtype=np.int64)
    stack: list[int] = []  # indices with strictly decreasing counts
    first = int(d[0]) if len(d) else 0
    for i in range(len(d)):
        while stack and c[stack[-1]] <= c[i]:
            stack.pop()
        spans[i] = d[i] - (d[stack[-1]] if stack else first - 1)
        stack.append(i)
    return pd.DataFrame({"day": d, "c": c, "span": spans})


def q_stock_span(sf_dir: str):
    """(day, c, span) over the daily event-count series."""
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
    return agg.repartition(1).map_batches(
        _span_fold, batch_format="pandas", batch_size=None)


_SPAN_SQL = f"""
    WITH d AS (
      SELECT epoch_us(ts) // {_DAY_US} AS day, count(*)::BIGINT AS c
      FROM events GROUP BY 1),
    f AS (SELECT min(day) AS d0 FROM d)
    SELECT day::BIGINT AS day, c,
           (day - COALESCE((SELECT max(d2.day) FROM d d2
                            WHERE d2.day < d.day AND d2.c > d.c),
                           f.d0 - 1))::BIGINT AS span
    FROM d, f
"""


QUERIES = {
    "abc_class": q_abc_class,
    "stock_span": q_stock_span,
}

ORACLE = {
    "abc_class": _ABC_SQL,
    "stock_span": _SPAN_SQL,
}
