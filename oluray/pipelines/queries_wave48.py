"""Wave-48 catalog: per-community modularity components.

`modularity_parts` is Newman modularity's exact integer core over
the connected-component partition of the interaction graph: per
component label, the internal edge count e_c and the degree sum
d_c — Q = sum_c (e_c/m - (d_c/(2m))^2) is the caller's fold (for a
CC partition every edge is internal, making Q's first term 1; the
second term is the size-concentration penalty — the useful signal).
Labels come from the distributed `connected_components` machinery
(the same labels `cc_labels` verifies hash-exact); edges and
degrees join against the aggregate-sized label table. The oracle
extends the recursive-reachability CTE with the edge/degree
rollups.
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from oluray.stages import joins


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


def q_modularity_parts(sf_dir: str):
    """(label, n_edges, sum_deg): internal edges and degree mass per
    connected component (canonical distinct edges; label = component
    min node id)."""
    from oluray.pipelines.queries import _interaction_edges

    e = _interaction_edges(sf_dir).materialize()
    labels = joins.connected_components(e, "a", "b",
                                        num_partitions=8) \
        .materialize()

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        lo = np.minimum(df["a"].to_numpy(), df["b"].to_numpy())
        hi = np.maximum(df["a"].to_numpy(), df["b"].to_numpy())
        return pd.DataFrame({"lo": lo, "hi": hi}).drop_duplicates()

    ce = joins.distinct(
        e.map_batches(canon, batch_format="pandas"), ["lo", "hi"],
        num_partitions=8)

    # an edge is internal to its lo-endpoint's component (CC: both
    # endpoints share the label)
    je = joins.hash_join(
        ce, labels.map_batches(
            lambda d: d.rename(columns={"node": "lo"}),
            batch_format="pandas"),
        "lo", num_partitions=8)

    def e_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("label", as_index=False).size().rename(
            columns={"size": "n_edges"})
        g["n_edges"] = g["n_edges"].astype("int64")
        g["sum_deg"] = np.zeros(len(g), dtype=np.int64)
        return g

    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": np.concatenate(
            [df["lo"].to_numpy(np.int64), df["hi"].to_numpy(np.int64)])})

    jd = joins.hash_join(
        ce.map_batches(endpoints, batch_format="pandas"),
        labels, "node", num_partitions=8)

    def d_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("label", as_index=False).size().rename(
            columns={"size": "sum_deg"})
        g["sum_deg"] = g["sum_deg"].astype("int64")
        g["n_edges"] = np.zeros(len(g), dtype=np.int64)
        return g

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("label", as_index=False)[
            ["n_edges", "sum_deg"]].sum()
        for c in ("label", "n_edges", "sum_deg"):
            g[c] = g[c].astype("int64")
        return g

    both = je.map_batches(e_part, batch_format="pandas").union(
        jd.map_batches(d_part, batch_format="pandas"))
    return joins.grouped_agg(both, ["label"], fold, num_partitions=8,
                             pre_repartition=False)


def _modularity_sql() -> str:
    from oluray.pipelines.queries_wave22 import _EDGES_CTE

    return f"""
    WITH RECURSIVE {_EDGES_CTE},
    sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
    walk AS (
      SELECT a AS node, b AS reach FROM sym
      UNION
      SELECT w.node, s.b FROM walk w JOIN sym s ON s.a = w.reach
      WHERE s.b <> w.node),
    lab AS (SELECT node, least(node, min(reach)) AS label
            FROM walk GROUP BY node),
    canon AS (SELECT DISTINCT LEAST(a, b) AS lo, GREATEST(a, b) AS hi
              FROM edges),
    ec AS (SELECT l.label, count(*)::BIGINT AS n_edges
           FROM canon JOIN lab l ON l.node = canon.lo
           GROUP BY l.label),
    dc AS (SELECT l.label, count(*)::BIGINT AS sum_deg
           FROM (SELECT lo AS node FROM canon
                 UNION ALL SELECT hi FROM canon) ep
           JOIN lab l ON l.node = ep.node
           GROUP BY l.label)
    SELECT ec.label, ec.n_edges, dc.sum_deg
    FROM ec JOIN dc ON ec.label = dc.label
    """


QUERIES = {
    "modularity_parts": q_modularity_parts,
}

ORACLE = {
    "modularity_parts": _modularity_sql(),
}
