"""Wave-35 catalog: common-neighbor link prediction and A/B
conversion lift over the buffered spatial split.

`link_predict` is the classic link-prediction baseline: the top-20
NON-adjacent node pairs of the interaction graph ranked by common
neighbor count (ties: smaller (u, w)). Wedge enumeration per center
node (the triangle counter's shape — per-hub degree capping via
the high-degree split is the documented scale path), then an
anti-join against the edge set. The oracle replays the wedge join
in SQL.

`ab_lift` composes wave-24's leakage-safe spatial split downstream:
per split class, how many users land there (by their FIRST event's
cell) and how many of them convert (any purchase) — the exact
integer 2xK table an experiment readout divides. Split assignment
reuses the `spatial_split` operator verbatim; the per-user fold is
one hash partition.
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from oluray.stages import joins

LP_TOPK = 20


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# link_predict — top non-edges by common neighbors
# ---------------------------------------------------------------------------


def q_link_predict(sf_dir: str):
    """(u, w, cn): the 20 highest-common-neighbor non-adjacent pairs
    of the interaction graph, u < w, ties by (u, w)."""
    from oluray.pipelines.queries import _interaction_edges

    e = _interaction_edges(sf_dir)

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        lo = np.minimum(df["a"].to_numpy(), df["b"].to_numpy())
        hi = np.maximum(df["a"].to_numpy(), df["b"].to_numpy())
        return pd.DataFrame({"lo": lo, "hi": hi}).drop_duplicates()

    ce = joins.distinct(
        e.map_batches(canon, batch_format="pandas"), ["lo", "hi"],
        num_partitions=8).materialize()

    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c": np.concatenate([df["lo"].to_numpy(np.int64),
                                 df["hi"].to_numpy(np.int64)]),
            "n": np.concatenate([df["hi"].to_numpy(np.int64),
                                 df["lo"].to_numpy(np.int64)])})

    adj = ce.map_batches(both_dirs, batch_format="pandas")

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        out_u, out_w = [], []
        for _, sub in df.groupby("c", sort=False):
            nb = np.sort(np.unique(sub["n"].to_numpy(np.int64)))
            if len(nb) < 2:
                continue
            iu, iw = np.triu_indices(len(nb), k=1)
            out_u.append(nb[iu])
            out_w.append(nb[iw])
        if not out_u:
            return pd.DataFrame({"u": pd.array([], dtype="int64"),
                                 "w": pd.array([], dtype="int64"),
                                 "cn": pd.array([], dtype="int64")})
        g = pd.DataFrame({"u": np.concatenate(out_u),
                          "w": np.concatenate(out_w),
                          "cn": 1})
        return g.groupby(["u", "w"], as_index=False)["cn"].sum()

    # wedge pairs per center; per-(u, w) counts fold by hash
    wd = joins.grouped_agg(
        joins.partitioned_map(adj, ["c"], wedges, num_partitions=8),
        ["u", "w"],
        lambda d: d.groupby(["u", "w"], as_index=False)["cn"].sum(),
        num_partitions=8, pre_repartition=False)

    # anti-join existing edges: pack (u, w) into one key
    PACK = np.int64(1) << np.int64(32)

    def pack_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["pk"] = (df["u"].astype("int64") * PACK
                    + df["w"].astype("int64"))
        return df

    def pack_edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"pk": df["lo"].astype("int64") * PACK
                             + df["hi"].astype("int64")})

    cand = joins.semi_join(
        wd.map_batches(pack_pairs, batch_format="pandas"),
        ce.map_batches(pack_edges, batch_format="pandas"),
        "pk", anti=True, num_partitions=8)

    def top(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cn", "u", "w"],
                            ascending=[False, True, True])
        out = df.head(LP_TOPK)[["u", "w", "cn"]].reset_index(drop=True)
        for c in ("u", "w", "cn"):
            out[c] = out[c].astype("int64")
        return out

    # two-level top-k: per-partition heads, then the tiny final
    return cand.map_batches(top, batch_format="pandas",
                            batch_size=None) \
        .repartition(1).map_batches(top, batch_format="pandas",
                                    batch_size=None)


def _link_predict_sql() -> str:
    from oluray.pipelines.queries_wave22 import _EDGES_CTE

    return f"""
    WITH {_EDGES_CTE},
    canon AS (SELECT DISTINCT LEAST(a, b) AS lo, GREATEST(a, b) AS hi
              FROM edges),
    adj AS (SELECT lo AS c, hi AS n FROM canon
            UNION ALL SELECT hi, lo FROM canon),
    wedge AS (
      SELECT e1.n AS u, e2.n AS w, count(*)::BIGINT AS cn
      FROM adj e1 JOIN adj e2 ON e1.c = e2.c AND e1.n < e2.n
      GROUP BY e1.n, e2.n),
    cand AS (
      SELECT u, w, cn FROM wedge
      WHERE NOT EXISTS (SELECT 1 FROM canon
                        WHERE canon.lo = wedge.u
                          AND canon.hi = wedge.w))
    SELECT u, w, cn FROM cand
    ORDER BY cn DESC, u, w LIMIT {LP_TOPK}
    """


# ---------------------------------------------------------------------------
# ab_lift — conversion by spatial-split arm
# ---------------------------------------------------------------------------


def q_ab_lift(sf_dir: str):
    """(split, n_users, n_converted): users assigned by their first
    event's split class (ts, event_id order); converted = any
    purchase event. Reuses the wave-24 `spatial_split` operator."""
    from oluray.pipelines.queries_wave24 import q_spatial_split

    split = q_spatial_split(sf_dir)
    ev = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "event_type"])
    j = joins.hash_join(ev, split, "event_id", num_partitions=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        first = df.groupby("user_id", as_index=False).first()
        conv = df.assign(p=(df["event_type"] == "purchase")
                         .astype("int64")) \
            .groupby("user_id", as_index=False)["p"].max()
        m = first.merge(conv, on="user_id")
        return pd.DataFrame({"user_id": m["user_id"].astype("int64"),
                             "split": m["split"],
                             "conv": m["p"].astype("int64")})

    users = joins.partitioned_map(j, ["user_id"], per_user,
                                  num_partitions=8)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("split", as_index=False).agg(
            n_users=("user_id", "size"), n_converted=("conv", "sum"))
        g["n_users"] = g["n_users"].astype("int64")
        g["n_converted"] = g["n_converted"].astype("int64")
        return g

    return joins.grouped_agg(users, ["split"], fold, num_partitions=4,
                             pre_repartition=False)


def _ab_lift_sql() -> str:
    from oluray.pipelines.queries_wave24 import _split_sql

    return f"""
    WITH s AS ({_split_sql()}),
    ranked AS (
      SELECT e.user_id, s.split,
             row_number() OVER (PARTITION BY e.user_id
                                ORDER BY e.ts, e.event_id) AS rn
      FROM events e JOIN s ON e.event_id = s.event_id),
    first AS (SELECT user_id, split FROM ranked WHERE rn = 1),
    conv AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'purchase' THEN 1
                      ELSE 0 END) AS conv
      FROM events GROUP BY user_id)
    SELECT f.split, count(*)::BIGINT AS n_users,
           SUM(c.conv)::BIGINT AS n_converted
    FROM first f JOIN conv c ON f.user_id = c.user_id
    GROUP BY f.split
    """


QUERIES = {
    "link_predict": q_link_predict,
    "ab_lift": q_ab_lift,
}

ORACLE = {
    "link_predict": _link_predict_sql(),
    "ab_lift": _ab_lift_sql(),
}
