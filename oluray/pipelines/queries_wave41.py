"""Wave-41 catalog: cohort LTV curve and the Theil-Sen robust
slope.

`ltv_curve` is the growth-analytics staple: order counts and exact
cents revenue by TENURE month — whole 30-day buckets since each
customer's first order. Per-customer first-day folds once
(aggregate-sized) and joins back; the bucket rollup is one grouped
sum. The oracle replays it with a window-min.

`theil_sen` is the robust trend estimator (the median of all
pairwise slopes — up to 29.3% breakdown, the nonparametric
counterpart of `group_linreg`'s least squares, completing the
`trend_test` pair): over the daily event-count series, the LOWER
MEDIAN pairwise slope as an exact fraction (dy, dx reduced by gcd)
— fraction comparisons are cross-multiplied, no float enters the
selection. The day series is aggregate-sized, so the O(n^2) pair
set (the published estimator's definition) stays in one task.
Rows-only (exact fraction medians are not SQL); brute-verified.
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations



import numpy as np
import pandas as pd
import ray.data

from oluray.stages import joins

_DAY_US = 86_400_000_000
LTV_BUCKET_DAYS = 30


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# ltv_curve — revenue by tenure month
# ---------------------------------------------------------------------------


def q_ltv_curve(sf_dir: str):
    """(tenure_month, n_orders, cents): orders bucketed by whole
    30-day periods since their customer's first order day."""
    from oluray.pipelines.queries import _round_half_away

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice",
                    "o_orderdate"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_custkey": df["o_custkey"].astype("int64"),
            "day": df["o_orderdate"].astype("datetime64[us]")
                .astype("int64") // _DAY_US,
            "cents": _round_half_away(
                df["o_totalprice"].to_numpy(np.float64) * 100.0)})

    prepped = orders.map_batches(prep,
                                 batch_format="pandas").materialize()

    def first_fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", as_index=False)["day"].min() \
            .rename(columns={"day": "day0"})
        g["day0"] = g["day0"].astype("int64")
        return g

    first = joins.grouped_agg(prepped, ["o_custkey"], first_fold,
                              num_partitions=8)
    j = joins.hash_join(prepped, first, "o_custkey", num_partitions=8)

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        m = ((df["day"].to_numpy(np.int64)
              - df["day0"].to_numpy(np.int64)) // LTV_BUCKET_DAYS)
        g = pd.DataFrame({"tenure_month": m, "n_orders": 1,
                          "cents": df["cents"].to_numpy(np.int64)})
        return g.groupby("tenure_month", as_index=False).sum()

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("tenure_month", as_index=False)[
            ["n_orders", "cents"]].sum()
        for c in ("tenure_month", "n_orders", "cents"):
            g[c] = g[c].astype("int64")
        return g

    return joins.grouped_agg(
        j.map_batches(bucket, batch_format="pandas"),
        ["tenure_month"], fold, num_partitions=4,
        pre_repartition=False)


_LTV_SQL = f"""
    WITH o AS (
      SELECT o_custkey AS ck,
             epoch_us(o_orderdate::TIMESTAMP) // {_DAY_US} AS day,
             round(o_totalprice * 100.0, 0)::BIGINT AS cents
      FROM orders),
    w AS (SELECT day, cents,
                 min(day) OVER (PARTITION BY ck) AS day0
          FROM o)
    SELECT ((day - day0) // {LTV_BUCKET_DAYS})::BIGINT
             AS tenure_month,
           count(*)::BIGINT AS n_orders, SUM(cents)::BIGINT AS cents
    FROM w GROUP BY 1
"""


# ---------------------------------------------------------------------------
# theil_sen — exact lower-median pairwise slope of daily counts
# ---------------------------------------------------------------------------


def theil_sen_fraction(days: np.ndarray,
                       counts: np.ndarray) -> tuple[int, int]:
    """Lower-median pairwise slope as a reduced exact fraction
    (positive dx). Fractions sort by cross-multiplication via
    fractions.Fraction (exact rational ordering)."""
    from fractions import Fraction

    slopes = []
    n = len(days)
    for i in range(n):
        for j in range(i + 1, n):
            dx = int(days[j] - days[i])
            if dx:
                slopes.append(Fraction(int(counts[j] - counts[i]),
                                       dx))
    if not slopes:
        return 0, 1
    slopes.sort()
    f = slopes[(len(slopes) - 1) // 2]
    return f.numerator, f.denominator  # Fraction is already reduced


def q_theil_sen(sf_dir: str):
    """One row (n_days, slope_num, slope_den): robust trend of
    events/day."""
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
        num, den = theil_sen_fraction(df["day"].to_numpy(np.int64),
                                      df["c"].to_numpy(np.int64))
        return pd.DataFrame([{"n_days": len(df), "slope_num": num,
                              "slope_den": den}])

    return agg.repartition(1).map_batches(run, batch_format="pandas",
                                          batch_size=None)


QUERIES = {
    "ltv_curve": q_ltv_curve,
    "theil_sen": q_theil_sen,
}

ORACLE = {
    "ltv_curve": _LTV_SQL,
}
