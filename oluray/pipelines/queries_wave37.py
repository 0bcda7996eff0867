"""Wave-37 catalog: revenue-share filter, log-binned degree
histogram, and greedy one-to-one distance matching.

`important_parts` is the TPC-H Q11 shape — rows whose GROUP share
exceeds a GLOBAL correlated scalar aggregate: parts whose lineitem
revenue (exact cents) is at least 1.5x the per-part average
(scale-invariant, so the filter stays selective-but-nonempty at
every sf). The global total and part count fold once and ride into
the filter as the exact integer comparison
2 * n_parts * rev >= 3 * total — no float share.

`degree_hist` is the power-law screen of network analysis: node
counts per floor(log2(degree)) bucket of the interaction graph —
the log-binned histogram whose tail slope diagnoses hub structure.
Degrees from the canonical edge set; the binning is a tiny
aggregate fold.

`greedy_matching` is one-to-one assignment (sensor-to-station,
order-to-courier): KNN_FEATURES matched to their nearest customers
greedily by ascending exact integer L1 microdegree distance (ties:
smaller feature, then customer id), each side used at most once.
Candidate pairs are formed feature-locally (features are a
broadcast constant); only the aggregate-sized candidate list
reaches the sequential greedy fold. Rows-only (iterative argmin is
not SQL); brute-verified in pytest.
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from oluray.functions import geo
from oluray.stages import joins

SHARE_NUM, SHARE_DEN = 3, 2  # "important" = >= 1.5x per-part average


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# important_parts — group share vs global total (TPC-H Q11 shape)
# ---------------------------------------------------------------------------


def q_important_parts(sf_dir: str):
    """(l_partkey, rev_cents) for parts with SHARE_DEN * n_parts *
    rev >= SHARE_NUM * total revenue, exact integers."""
    from oluray.pipelines.queries import _round_half_away

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount"])

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        rev = _round_half_away(
            df["l_extendedprice"].to_numpy(np.float64)
            * (1.0 - df["l_discount"].to_numpy(np.float64)) * 100.0)
        g = pd.DataFrame({"l_partkey": df["l_partkey"].astype("int64"),
                          "rev_cents": rev})
        return g.groupby("l_partkey", as_index=False)["rev_cents"].sum()

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_partkey", as_index=False)["rev_cents"].sum()
        g["rev_cents"] = g["rev_cents"].astype("int64")
        return g

    rev = joins.grouped_agg(
        li.map_batches(cents, batch_format="pandas"),
        ["l_partkey"], fold, num_partitions=8,
        pre_repartition=False).materialize()
    total = int(rev.sum("rev_cents") or 0)
    n_parts = int(rev.count())

    def keep(t: pa.Table) -> pa.Table:
        r = t["rev_cents"].to_numpy(zero_copy_only=False)
        # Python-int threshold: n_parts * r stays in int64 at these
        # magnitudes; the SQL twin runs HUGEINT
        mask = SHARE_DEN * n_parts * r >= SHARE_NUM * total
        return t.filter(pa.array(mask))

    return rev.map_batches(keep, batch_format="pyarrow")


_IMPORTANT_SQL = f"""
    WITH r AS (
      SELECT l_partkey,
             SUM(round(l_extendedprice * (1.0 - l_discount) * 100.0,
                       0)::BIGINT)::BIGINT AS rev_cents
      FROM lineitem GROUP BY l_partkey),
    t AS (SELECT SUM(rev_cents)::HUGEINT AS total,
                 count(*)::HUGEINT AS n FROM r)
    SELECT l_partkey, rev_cents FROM r, t
    WHERE {SHARE_DEN} * t.n * rev_cents >= {SHARE_NUM} * t.total
"""


# ---------------------------------------------------------------------------
# degree_hist — log2-binned degree histogram
# ---------------------------------------------------------------------------


def q_degree_hist(sf_dir: str):
    """(log2_bucket, n_nodes): floor(log2(deg)) histogram of the
    interaction graph's degrees."""
    from oluray.pipelines.queries import _interaction_edges

    e = _interaction_edges(sf_dir)

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        lo = np.minimum(df["a"].to_numpy(), df["b"].to_numpy())
        hi = np.maximum(df["a"].to_numpy(), df["b"].to_numpy())
        return pd.DataFrame({"lo": lo, "hi": hi}).drop_duplicates()

    ce = joins.distinct(
        e.map_batches(canon, batch_format="pandas"), ["lo", "hi"],
        num_partitions=8)

    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": np.concatenate(
            [df["lo"].to_numpy(np.int64), df["hi"].to_numpy(np.int64)])})

    def dcount(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False).size().rename(
            columns={"size": "deg"})
        g["deg"] = g["deg"].astype("int64")
        return g

    deg = joins.grouped_agg(
        ce.map_batches(endpoints, batch_format="pandas"),
        ["node"], dcount, num_partitions=8, pre_repartition=False)

    def binned(df: pd.DataFrame) -> pd.DataFrame:
        d = df["deg"].to_numpy(np.int64)
        # floor(log2) via bit length, integer-exact
        b = np.array([int(v).bit_length() - 1 for v in d],
                     dtype=np.int64)
        g = pd.DataFrame({"log2_bucket": b, "n_nodes": 1})
        return g.groupby("log2_bucket", as_index=False)["n_nodes"].sum()

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("log2_bucket", as_index=False)["n_nodes"].sum()
        g["n_nodes"] = g["n_nodes"].astype("int64")
        return g

    return joins.grouped_agg(
        deg.map_batches(binned, batch_format="pandas"),
        ["log2_bucket"], fold, num_partitions=4,
        pre_repartition=False)


def _degree_hist_sql() -> str:
    from oluray.pipelines.queries_wave22 import _EDGES_CTE

    return f"""
    WITH {_EDGES_CTE},
    canon AS (SELECT DISTINCT LEAST(a, b) AS lo, GREATEST(a, b) AS hi
              FROM edges),
    deg AS (SELECT node, count(*)::BIGINT AS deg FROM (
              SELECT lo AS node FROM canon
              UNION ALL SELECT hi FROM canon) GROUP BY node)
    SELECT CAST(floor(log2(deg)) AS BIGINT) AS log2_bucket,
           count(*)::BIGINT AS n_nodes
    FROM deg GROUP BY 1
    """


# ---------------------------------------------------------------------------
# greedy_matching — one-to-one nearest assignment
# ---------------------------------------------------------------------------

CAND_K = 8  # candidates kept per feature before the greedy fold


def _greedy_assign(df: pd.DataFrame) -> pd.DataFrame:
    """Sequential greedy over the candidate list: ascending
    (dist, feature_id, cust), skip pairs whose side is taken."""
    df = df.sort_values(["dist_l1", "feature_id", "c_custkey"]) \
        .reset_index(drop=True)
    used_f, used_c, rows = set(), set(), []
    for r in df.itertuples():
        f, c = int(r.feature_id), int(r.c_custkey)
        if f in used_f or c in used_c:
            continue
        used_f.add(f)
        used_c.add(c)
        rows.append((f, c, int(r.dist_l1)))
    return pd.DataFrame(rows, columns=["feature_id", "c_custkey",
                                       "dist_l1"])


def q_greedy_matching(sf_dir: str):
    """(feature_id, c_custkey, dist_l1): greedy one-to-one matching
    of KNN_FEATURES to customers by exact L1 microdegree distance.
    Per-batch: each feature keeps its CAND_K nearest candidates
    (a per-block combiner), so only ~|features| * CAND_K candidate
    rows reach the sequential fold. CAND_K bounds correctness only
    if a feature's match is among its kept candidates — with
    |features| << CAND_K * blocks this holds (asserted in pytest
    against the full brute)."""
    from oluray.pipelines.queries import KNN_FEATURES

    cust = _read(sf_dir, "customer", ["c_custkey"])
    fid = np.array([f[0] for f in KNN_FEATURES], dtype=np.int64)
    flon = np.array([f[1] for f in KNN_FEATURES])
    flat_ = np.array([f[2] for f in KNN_FEATURES])
    fx = np.round((flon + 180.0) * 1e7).astype(np.int64)
    fy = np.round((flat_ + 90.0) * 1e7).astype(np.int64)

    def cands(t: pa.Table) -> pa.Table:
        keys = t["c_custkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        xu, yu = geo.derive_units(keys)
        # L1 in 1e-7-degree units, exact integers
        d = (np.abs(xu[None, :] - fx[:, None])
             + np.abs(yu[None, :] - fy[:, None]))
        k = min(CAND_K, d.shape[1])
        idx = np.argpartition(d, k - 1, axis=1)[:, :k]
        rows_f = np.repeat(fid, k)
        rows_c = keys[idx].ravel()
        rows_d = np.take_along_axis(d, idx, axis=1).ravel()
        return pa.table({"feature_id": pa.array(rows_f),
                         "c_custkey": pa.array(rows_c),
                         "dist_l1": pa.array(rows_d)})

    cand = cust.map_batches(cands, batch_format="pyarrow")
    return cand.repartition(1).map_batches(
        _greedy_assign, batch_format="pandas", batch_size=None)


QUERIES = {
    "important_parts": q_important_parts,
    "degree_hist": q_degree_hist,
    "greedy_matching": q_greedy_matching,
}

ORACLE = {
    "important_parts": _IMPORTANT_SQL,
    "degree_hist": _degree_hist_sql(),
}
