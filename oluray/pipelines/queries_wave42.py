"""Wave-42 catalog: HITS hub/authority scores and the largest
occupied rectangle.

`hits_scores` is Kleinberg's HITS — the link-analysis sibling of
the integer-exact `pagerank`: over the DIRECTED deduped interaction
edges, unnormalized power iterations from h0 = 1:
a1 = A^T h0 (in-degree), h1 = A a1, a2 = A^T h1. Every score is an
exact BIGINT (normalization is a single caller-side division, and
the 2.5 iterations bound values by degree^3 — far inside int64 on
any real graph). Each iteration is one hash join of the edge list
against the aggregate-sized score table; the oracle chains the same
joins in CTEs.

`max_rectangle` is the largest all-occupied axis-aligned rectangle
of the res-5 event lattice (the region-extraction / ad-placement
classic): the O(rows * cols) histogram-stack DP, run on the
aggregate raster in one task. Ties resolve deterministically by
scan order. Rows-only (a monotone stack is
not SQL); verified against an exhaustive brute over all rectangles.
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from oluray.functions import geo
from oluray.stages import joins

MR_RES = 5


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# hits_scores — exact unnormalized HITS over directed edges
# ---------------------------------------------------------------------------


def q_hits_scores(sf_dir: str):
    """(node, hub, auth): hub = h1 = A a1, auth = a2 = A^T h1 with
    a1 = in-degree; nodes scoring 0 on both are omitted."""
    from oluray.pipelines.queries import _interaction_edges

    e = _interaction_edges(sf_dir)

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df[["a", "b"]].drop_duplicates()

    de = joins.distinct(
        e.map_batches(dedup, batch_format="pandas"), ["a", "b"],
        num_partitions=8).materialize()

    def count_by(col: str, ds):
        def c(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(col, as_index=False).size().rename(
                columns={"size": "s", col: "node"})
            g["s"] = g["s"].astype("int64")
            return g

        return ds.map_batches(c, batch_format="pandas")

    # a1 = in-degree (A^T * 1)
    def fold_s(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False)["s"].sum()
        g["s"] = g["s"].astype("int64")
        return g

    a1 = joins.grouped_agg(count_by("b", de), ["node"], fold_s,
                           num_partitions=8, pre_repartition=False)

    # h1(u) = sum over u->v of a1(v): join edges on b
    j1 = joins.hash_join(
        de, a1.map_batches(
            lambda d: d.rename(columns={"node": "b", "s": "a1"}),
            batch_format="pandas"),
        "b", num_partitions=8)

    def h_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("a", as_index=False)["a1"].sum().rename(
            columns={"a": "node", "a1": "s"})
        g["s"] = g["s"].astype("int64")
        return g

    h1 = joins.grouped_agg(
        j1.map_batches(h_part, batch_format="pandas"),
        ["node"], fold_s, num_partitions=8,
        pre_repartition=False)

    # a2(v) = sum over u->v of h1(u): join edges on a
    j2 = joins.hash_join(
        de, h1.map_batches(
            lambda d: d.rename(columns={"node": "a", "s": "h1"}),
            batch_format="pandas"),
        "a", num_partitions=8)

    def a_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("b", as_index=False)["h1"].sum().rename(
            columns={"b": "node", "h1": "s"})
        g["s"] = g["s"].astype("int64")
        return g

    a2 = joins.grouped_agg(
        j2.map_batches(a_part, batch_format="pandas"),
        ["node"], fold_s, num_partitions=8,
        pre_repartition=False)

    hub = h1.map_batches(
        lambda d: pd.DataFrame({"node": d["node"].astype("int64"),
                                "hub": d["s"].astype("int64"),
                                "auth": np.zeros(len(d),
                                                 dtype=np.int64)}),
        batch_format="pandas")
    auth = a2.map_batches(
        lambda d: pd.DataFrame({"node": d["node"].astype("int64"),
                                "hub": np.zeros(len(d),
                                                dtype=np.int64),
                                "auth": d["s"].astype("int64")}),
        batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False)[["hub", "auth"]].sum()
        for c in ("node", "hub", "auth"):
            g[c] = g[c].astype("int64")
        return g

    return joins.grouped_agg(hub.union(auth), ["node"], merge,
                             num_partitions=8, pre_repartition=False)


def _hits_sql() -> str:
    from oluray.pipelines.queries_wave22 import _EDGES_CTE

    return f"""
    WITH {_EDGES_CTE},
    de AS (SELECT DISTINCT a, b FROM edges),
    a1 AS (SELECT b AS node, count(*)::BIGINT AS s FROM de
           GROUP BY b),
    h1 AS (SELECT de.a AS node, SUM(a1.s)::BIGINT AS s
           FROM de JOIN a1 ON a1.node = de.b GROUP BY de.a),
    a2 AS (SELECT de.b AS node, SUM(h1.s)::BIGINT AS s
           FROM de JOIN h1 ON h1.node = de.a GROUP BY de.b)
    SELECT COALESCE(h1.node, a2.node) AS node,
           COALESCE(h1.s, 0)::BIGINT AS hub,
           COALESCE(a2.s, 0)::BIGINT AS auth
    FROM h1 FULL OUTER JOIN a2 ON h1.node = a2.node
    """


# ---------------------------------------------------------------------------
# max_rectangle — largest all-occupied rectangle on the lattice
# ---------------------------------------------------------------------------


def _max_rect(df: pd.DataFrame) -> pd.DataFrame:
    """Histogram-stack DP over the aggregate raster. Returns one row
    (y_lo, x_lo, y_hi, x_hi, area). Module-level so pytest drives
    the production kernel."""
    n = 1 << MR_RES
    occ = np.zeros((n, n), dtype=bool)
    if len(df):
        _, x, y = geo.cell_decode(df["cell"].to_numpy(np.int64))
        occ[y, x] = True
    heights = np.zeros(n, dtype=np.int64)
    best_area = 0
    best_rect = None
    for yy in range(n):
        heights = np.where(occ[yy], heights + 1, 0)
        # largest rectangle in histogram via monotone stack; the
        # sentinel h=0 pass at xx == n closes every open index
        stack: list[int] = []
        for xx in range(n + 1):
            h = int(heights[xx]) if xx < n else 0
            while stack and heights[stack[-1]] >= h:
                top = stack.pop()
                left = stack[-1] + 1 if stack else 0
                area = int(heights[top]) * (xx - left)
                if area > best_area:
                    best_area = area
                    best_rect = (yy - int(heights[top]) + 1, left,
                                 yy, xx - 1)
            if xx < n:
                stack.append(xx)
    if best_rect is None:
        return pd.DataFrame([{"y_lo": -1, "x_lo": -1, "y_hi": -1,
                              "x_hi": -1, "area": 0}])
    y_lo, x_lo, y_hi, x_hi = best_rect
    return pd.DataFrame([{"y_lo": y_lo, "x_lo": x_lo, "y_hi": y_hi,
                          "x_hi": x_hi, "area": best_area}])


def q_max_rectangle(sf_dir: str):
    """One row: the largest all-occupied rectangle of the res-5
    event lattice (ties -> lexicographically smallest corner)."""
    from oluray.pipelines.queries_wave18 import _event_cell_counts

    counts = _event_cell_counts(sf_dir, MR_RES)
    return counts.repartition(1).map_batches(
        _max_rect, batch_format="pandas", batch_size=None)


QUERIES = {
    "hits_scores": q_hits_scores,
    "max_rectangle": q_max_rectangle,
}

ORACLE = {
    "hits_scores": _hits_sql(),
}
