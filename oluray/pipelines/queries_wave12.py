"""Wave-12 catalog: CUSUM change detection, sorted-neighborhood
dedup blocking, functional-dependency profiling.

`cusum_alerts` adds sequential change-point detection to the
statistics family (chi2 / KS are batch tests; CUSUM is the streaming
one). `snm_pairs` adds the third classic dedup blocking strategy
next to LSH banding and PPJoin prefixes: sort everything once, pair
only rank-neighbors — the windowed self-join expressed as W exact
integer equi-joins on a histogram-offset global rank (no global sort
materialization). `fd_check` adds schema profiling: does column A
functionally determine column B. Registered by
``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from oluray.stages import joins


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# cusum_alerts — per-user CUSUM drawup statistic (change detection)
# ---------------------------------------------------------------------------


def q_cusum_alerts(sf_dir: str):
    """Per-user CUSUM statistic over the event value stream: with
    integer deviations dev_i = v_i * n_u - S_u (value cents scaled by
    the user's own count so the mean subtraction stays integer), the
    drawup max_t (cum_t - min(0, min_{s<=t} cum_s)) is the classic
    one-sided CUSUM detection statistic — a sustained upward shift in
    spend produces a large drawup, white noise does not. Sequential
    by definition but vectorizable per user: one hash partition pass
    with C-level cumsum + cummin inside; everything integer, so the
    oracle matches bit-for-bit."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def cusum(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "n": pd.Series([], dtype="int64"),
            "cusum_max": pd.Series([], dtype="int64")})
        if len(df) == 0:
            return empty
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort").reset_index(drop=True)
        uid = df["user_id"].to_numpy(np.int64)
        v = df["value"].to_numpy(np.float64)
        vc = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)).astype(
            np.int64)
        out_u, out_n, out_c = [], [], []
        # per-user segments (already contiguous after the sort)
        starts = np.flatnonzero(
            np.concatenate(([True], uid[1:] != uid[:-1])))
        ends = np.concatenate((starts[1:], [len(uid)]))
        for s, e in zip(starts, ends):
            x = vc[s:e]
            n = e - s
            dev = x * n - x.sum()
            cum = np.cumsum(dev)
            mn = np.minimum(np.minimum.accumulate(cum), 0)
            out_u.append(int(uid[s]))
            out_n.append(int(n))
            out_c.append(int((cum - mn).max()))
        return pd.DataFrame({"user_id": out_u, "n": out_n,
                             "cusum_max": out_c}).astype("int64")

    return joins.partitioned_map(ev, ["user_id"], cusum,
                                 num_partitions=8)


_CUSUM_SQL = """
WITH s AS (
  SELECT user_id, ts, event_id, round(value * 100.0)::BIGINT AS v
  FROM events),
agg AS (SELECT user_id, count(*)::BIGINT AS n, sum(v)::BIGINT AS sv
        FROM s GROUP BY user_id),
d AS (SELECT s.user_id, ts, event_id, v * n - sv AS dev, n
      FROM s JOIN agg USING (user_id)),
c AS (SELECT user_id, n, ts, event_id,
             sum(dev) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS cum
      FROM d),
m AS (SELECT user_id, n, cum,
             least(min(cum) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW), 0) AS mn
      FROM c)
SELECT user_id, n, max(cum - mn)::BIGINT AS cusum_max
FROM m GROUP BY user_id, n
"""


# ---------------------------------------------------------------------------
# snm_pairs — sorted-neighborhood blocking (windowed rank self-join)
# ---------------------------------------------------------------------------

SNM_W = 3


def q_snm_pairs(sf_dir: str):
    """Sorted-neighborhood dedup blocking: order all customers once by
    (account balance, key) and pair every record with its W=3 rank
    neighbors — the third classic blocking strategy next to LSH
    banding (`minhash_pairs`) and prefix filtering (`jaccard_prefix`).
    The global rank comes from the histogram-offset trick (offsets
    over the bounded DISTINCT-value histogram + per-value group_rank)
    — no global sort materialization — and the rank-window self-join
    is W exact integer equi-joins (rank -> rank+delta), each a plain
    co-partitioned hash join: the sequential-looking 'sliding window
    over a sorted file' becomes fully parallel."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])

    def cents(t: pa.Table) -> pa.Table:
        v = t["c_acctbal"].to_numpy(zero_copy_only=False)
        vc = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)).astype(
            np.int64)
        return pa.table({
            "c_custkey": t["c_custkey"], "v": pa.array(vc)})

    keyed = cust.map_batches(cents, batch_format="pyarrow").materialize()

    def hist_c(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("v", as_index=False).size()
        return g.rename(columns={"size": "cnt"})

    def hist_s(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("v", as_index=False)["cnt"].sum()

    # offsets over the DISTINCT-value histogram (aggregate-sized, the
    # balanced_shards bound) -> global rank without a global sort
    hist = joins.grouped_agg(keyed, ["v"], hist_s, num_partitions=8,
                             combine_fn=hist_c).to_pandas()
    hist = hist.sort_values("v").reset_index(drop=True)
    offs = np.concatenate(([0], np.cumsum(hist["cnt"].to_numpy())[:-1]))
    off_map = dict(zip(hist["v"].astype(np.int64), offs.astype(np.int64)))

    ranked = joins.group_rank(keyed, ["v"], [("c_custkey", True)],
                              num_partitions=8)

    def grank(df: pd.DataFrame) -> pd.DataFrame:
        g = (df["v"].map(off_map).to_numpy(np.int64)
             + df["rank"].to_numpy(np.int64))
        return pd.DataFrame({"c_custkey": df["c_custkey"].astype("int64"),
                             "v": df["v"].astype("int64"), "g": g})

    gr = ranked.map_batches(grank, batch_format="pandas").materialize()

    def probes(df: pd.DataFrame) -> pd.DataFrame:
        reps = []
        for d in range(1, SNM_W + 1):
            reps.append(pd.DataFrame({
                "tgt": df["g"].to_numpy(np.int64) + d,
                "cust_a": df["c_custkey"].to_numpy(np.int64),
                "va": df["v"].to_numpy(np.int64),
                "dist": np.full(len(df), d, dtype=np.int64)}))
        return pd.concat(reps, ignore_index=True)

    left = gr.map_batches(probes, batch_format="pandas")
    _L = pa.schema([("tgt", pa.int64()), ("cust_a", pa.int64()),
                    ("va", pa.int64()), ("dist", pa.int64())])
    _R = pa.schema([("c_custkey", pa.int64()), ("v", pa.int64()),
                    ("g", pa.int64())])
    j = joins.hash_join(left, gr, on="tgt", right_on="g",
                        num_partitions=8, left_schema=_L,
                        right_schema=_R)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "cust_a": t["cust_a"], "cust_b": t["c_custkey"],
            "dist": t["dist"],
            "bal_gap": pa.array(
                t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
                - t["va"].to_numpy(zero_copy_only=False).astype(np.int64))})

    return j.map_batches(finish, batch_format="pyarrow")


_SNM_SQL = f"""
WITH r AS (
  SELECT c_custkey, round(c_acctbal * 100.0)::BIGINT AS v,
         row_number() OVER (ORDER BY round(c_acctbal * 100.0)::BIGINT,
                            c_custkey) AS g
  FROM customer)
SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
       (b.g - a.g)::BIGINT AS dist, (b.v - a.v)::BIGINT AS bal_gap
FROM r a JOIN r b ON b.g - a.g BETWEEN 1 AND {SNM_W}
"""


# ---------------------------------------------------------------------------
# fd_check — functional-dependency profiling
# ---------------------------------------------------------------------------

FD_CANDIDATES = (
    ("part", "p_brand", "p_type"),
    ("part", "p_partkey", "p_brand"),
    ("customer", "c_custkey", "c_mktsegment"),
    ("customer", "c_mktsegment", "c_nationkey"),
    ("orders", "o_orderkey", "o_orderstatus"),
    ("lineitem", "l_orderkey", "l_returnflag"),
)


def q_fd_check(sf_dir: str):
    """Functional-dependency profiling: A -> B holds iff
    |distinct A| == |distinct (A, B)| — the schema-discovery pass a
    data platform runs before choosing keys / normalizing. Each
    candidate is two combiner-bounded distinct counts (shuffle
    bounded by distinct keys per block, never rows); the driver sees
    six integers."""
    rows = []
    for table, lhs, rhs in FD_CANDIDATES:
        ds = _read(sf_dir, table, [lhs, rhs])
        n_lhs = joins.distinct(ds, [lhs], num_partitions=8).count()
        ds2 = _read(sf_dir, table, [lhs, rhs])
        n_pair = joins.distinct(ds2, [lhs, rhs], num_partitions=8).count()
        rows.append((table, lhs, rhs, n_lhs, n_pair,
                     1 if n_lhs == n_pair else 0))
    return pd.DataFrame(rows, columns=[
        "tbl", "lhs", "rhs", "n_lhs", "n_pairs", "holds"]).astype(
        {"n_lhs": "int64", "n_pairs": "int64", "holds": "int64"})


def _fd_sql() -> str:
    parts = []
    for table, lhs, rhs in FD_CANDIDATES:
        parts.append(f"""
SELECT '{table}' AS tbl, '{lhs}' AS lhs, '{rhs}' AS rhs,
       count(DISTINCT {lhs})::BIGINT AS n_lhs,
       (SELECT count(*) FROM (SELECT DISTINCT {lhs}, {rhs}
                              FROM {table}))::BIGINT AS n_pairs,
       (CASE WHEN count(DISTINCT {lhs}) =
             (SELECT count(*) FROM (SELECT DISTINCT {lhs}, {rhs}
                                    FROM {table}))
        THEN 1 ELSE 0 END)::BIGINT AS holds
FROM {table}""")
    return " UNION ALL ".join(parts)


QUERIES = {
    "cusum_alerts": q_cusum_alerts,
    "snm_pairs": q_snm_pairs,
    "fd_check": q_fd_check,
}

ORACLE = {
    "cusum_alerts": _CUSUM_SQL,
    "snm_pairs": _SNM_SQL,
    "fd_check": _fd_sql(),
}
