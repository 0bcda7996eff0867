"""Wave-36 catalog: exact stencil heat diffusion and the Pareto
concentration point.

`heat_steps` is the raster convolution-power primitive (heat/blur
kernels, cost-distance spreading): three steps of the unnormalized
5-point stencil A (center + 4-neighbors, border zero) applied to
the event-count raster — v3 = A^3 u in EXACT integers (the 1/5^3
normalization is the caller's constant). The engine applies the
stencil as three vectorized padded-shift adds on the
aggregate-sized raster; the oracle chains three offset joins.

`pareto_point` is the 80/20 concentration statistic every revenue
dashboard quotes: the smallest k such that the top-k customers (by
exact cents spend, custkey tiebreak) cover >= 80% of total revenue
— one row (n_customers, k80, cents_total, cents_k80), all BIGINT.
Per-customer aggregate first; the ranked cumulative runs on the
aggregate-sized spend table.
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from oluray.functions import geo
from oluray.stages import joins

HEAT_RES = 4   # 16 x 16
HEAT_STEPS = 3


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# heat_steps — v3 = A^3 u with the 5-point stencil, exact integers
# ---------------------------------------------------------------------------


def _heat_apply(df: pd.DataFrame) -> pd.DataFrame:
    n_grid = 1 << HEAT_RES
    u = np.zeros((n_grid, n_grid), dtype=np.int64)
    if len(df):
        _, x, y = geo.cell_decode(df["cell"].to_numpy(np.int64))
        u[y, x] = df["v"].to_numpy(np.int64)
    for _ in range(HEAT_STEPS):
        p = np.pad(u, 1)
        u = (u + p[:-2, 1:-1] + p[2:, 1:-1]
             + p[1:-1, :-2] + p[1:-1, 2:])
    ys, xs = np.nonzero(u)
    cells = (np.int64(HEAT_RES) * np.int64(geo.RES_SHIFT)
             + ys.astype(np.int64) * np.int64(geo.Y_SHIFT)
             + xs.astype(np.int64))
    return pd.DataFrame({"cell": cells,
                         "v3": u[ys, xs].astype("int64")})


def q_heat_steps(sf_dir: str):
    """(cell, v3) for cells with nonzero diffused value after 3
    exact stencil steps over the res-4 event raster."""
    from oluray.pipelines.queries_wave18 import _event_cell_counts

    counts = _event_cell_counts(sf_dir, HEAT_RES)
    return counts.repartition(1).map_batches(
        _heat_apply, batch_format="pandas", batch_size=None)


def _heat_sql() -> str:
    lon, lat = geo.derive_lonlat_sql("event_id")
    x, y = geo.cell_xy_sql(lon, lat, HEAT_RES)
    n = 1 << HEAT_RES
    offs = "(0,0),(1,0),(-1,0),(0,1),(0,-1)"
    step = """
    {dst} AS (
      SELECT s.x + o.dx AS x, s.y + o.dy AS y,
             SUM(s.v)::BIGINT AS v
      FROM {src} s, (VALUES {offs}) o(dx, dy)
      WHERE s.x + o.dx BETWEEN 0 AND {hi}
        AND s.y + o.dy BETWEEN 0 AND {hi}
      GROUP BY s.x + o.dx, s.y + o.dy)"""
    steps = ",".join(
        step.format(dst=f"u{i + 1}", src=f"u{i}", offs=offs,
                    hi=n - 1)
        for i in range(HEAT_STEPS))
    return f"""
    WITH u0 AS (
      SELECT x, y, count(*)::BIGINT AS v
      FROM (SELECT {x} AS x, {y} AS y FROM events) GROUP BY x, y),
    {steps}
    SELECT ({HEAT_RES} * {geo.RES_SHIFT} + y * {geo.Y_SHIFT} + x)
             AS cell,
           v AS v3
    FROM u{HEAT_STEPS} WHERE v > 0
    """


# ---------------------------------------------------------------------------
# pareto_point — smallest top-k covering 80% of revenue
# ---------------------------------------------------------------------------

PARETO_NUM, PARETO_DEN = 4, 5  # 80%


def q_pareto_point(sf_dir: str):
    """One row (n_customers, k80, cents_total, cents_k80): k80 =
    least k with 5 * cumsum(top-k spend) >= 4 * total (exact integer
    comparison); cents_k80 = that cumulative."""
    from oluray.pipelines.queries import _round_half_away

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "ck": df["o_custkey"].astype("int64"),
            "spend": _round_half_away(
                df["o_totalprice"].to_numpy(np.float64) * 100.0)})
        return g.groupby("ck", as_index=False)["spend"].sum()

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("ck", as_index=False)["spend"].sum()
        g["spend"] = g["spend"].astype("int64")
        return g

    spend = joins.grouped_agg(
        orders.map_batches(cents, batch_format="pandas"),
        ["ck"], fold, num_partitions=8, pre_repartition=False)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["spend", "ck"],
                            ascending=[False, True]).reset_index(
            drop=True)
        s = df["spend"].to_numpy(np.int64)
        cum = np.cumsum(s.astype(object))
        total = int(cum[-1]) if len(cum) else 0
        hit = np.flatnonzero(
            np.array([PARETO_DEN * int(c) >= PARETO_NUM * total
                      for c in cum]))
        k80 = int(hit[0]) + 1 if len(hit) else 0
        c80 = int(cum[k80 - 1]) if k80 else 0
        return pd.DataFrame([{"n_customers": len(df), "k80": k80,
                              "cents_total": total,
                              "cents_k80": c80}])

    # per-customer spend is the aggregate table; the ranked scan is
    # one task (the distributed alternative is a histogram-offset
    # k-th selection as in group_quantiles_dist)
    return spend.repartition(1).map_batches(
        finish, batch_format="pandas", batch_size=None)


_PARETO_SQL = f"""
    WITH sp AS (
      SELECT o_custkey AS ck,
             SUM(round(o_totalprice * 100.0, 0)::BIGINT)::BIGINT
               AS spend
      FROM orders GROUP BY o_custkey),
    r AS (
      SELECT spend,
             SUM(spend) OVER (ORDER BY spend DESC, ck
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             row_number() OVER (ORDER BY spend DESC, ck) AS k
      FROM sp),
    t AS (SELECT SUM(spend)::BIGINT AS total,
                 count(*)::BIGINT AS n FROM sp)
    SELECT t.n AS n_customers,
           (SELECT min(k) FROM r, t
            WHERE {PARETO_DEN} * r.cum >= {PARETO_NUM} * t.total)
             ::BIGINT AS k80,
           t.total AS cents_total,
           (SELECT min(cum) FROM r, t
            WHERE {PARETO_DEN} * r.cum >= {PARETO_NUM} * t.total)
             ::BIGINT AS cents_k80
    FROM t
"""


QUERIES = {
    "heat_steps": q_heat_steps,
    "pareto_point": q_pareto_point,
}

ORACLE = {
    "heat_steps": _heat_sql(),
    "pareto_point": _PARETO_SQL,
}
