"""Wave-34 catalog: posting-list compression sizing and RFM
customer scores.

`postings_size` is the IR/storage-planner primitive: for every
vocabulary term, the EXACT byte cost of its delta-encoded varint
posting list (sorted doc ids; first id absolute, then gaps; LEB128
byte count per value) plus df — what an inverted-index builder
budgets shards with. Doc-distinct (term, doc) pairs are row-local;
per-term delta+varint runs after a term-hash shuffle of id pairs
only. The oracle replays it with a LAG window and a threshold CASE.

`rfm_scores` is the classic CRM segmentation: per customer,
NTILE(5) buckets of Recency (last order day), Frequency (order
count) and Monetary (exact cents) — ascending tiles, ties broken
by custkey, the exact SQL NTILE convention `joins.group_ntile`
implements. Per-customer aggregate first; three aggregate-sized
ntile passes.
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data

from oluray.stages import joins

_TOKEN_RE = re.compile(r"[^a-z]+")
_VARINT_BOUNDS = np.array([1 << 7, 1 << 14, 1 << 21, 1 << 28,
                           1 << 35], dtype=np.int64)


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


def varint_bytes(v: np.ndarray) -> np.ndarray:
    """LEB128 byte count per non-negative int64 (< 2^35 here)."""
    return 1 + np.searchsorted(_VARINT_BOUNDS, v, side="right") \
        .astype(np.int64)


# ---------------------------------------------------------------------------
# postings_size — exact varint-delta bytes per term
# ---------------------------------------------------------------------------


def q_postings_size(sf_dir: str):
    """(term, df, bytes): document frequency and exact compressed
    posting-list size."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids, terms = [], []
        for did, txt in zip(df["doc_id"].to_numpy(),
                            df["text"].to_numpy()):
            ts = {t for t in _TOKEN_RE.split(str(txt).lower()) if t}
            ids.extend([int(did)] * len(ts))
            terms.extend(sorted(ts))
        return pd.DataFrame({"term": pd.array(terms, dtype="string"),
                             "doc_id": pd.array(ids, dtype="int64")})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["term", "doc_id"]).reset_index(drop=True)
        ids = df["doc_id"].to_numpy(np.int64)
        t = df["term"].to_numpy(dtype=object)
        new = np.ones(len(t), dtype=bool)
        if len(t) > 1:
            new[1:] = t[1:] != t[:-1]
        delta = np.where(new, ids, ids - np.roll(ids, 1))
        b = varint_bytes(delta)
        g = pd.DataFrame({"term": df["term"], "one": 1, "b": b})
        out = g.groupby("term", as_index=False).agg(
            df=("one", "sum"), bytes=("b", "sum"))
        out["df"] = out["df"].astype("int64")
        out["bytes"] = out["bytes"].astype("int64")
        return out

    return joins.grouped_agg(
        docs.map_batches(pairs, batch_format="pandas"),
        ["term"], fold, num_partitions=8, pre_repartition=False)


_POSTINGS_SQL = """
    WITH tok AS (
      SELECT DISTINCT doc_id,
             unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
      FROM documents),
    d AS (
      SELECT term, doc_id,
             COALESCE(doc_id - lag(doc_id) OVER (PARTITION BY term
                        ORDER BY doc_id), doc_id) AS delta
      FROM tok WHERE term <> ''),
    b AS (
      SELECT term,
             CASE WHEN delta < 128 THEN 1
                  WHEN delta < 16384 THEN 2
                  WHEN delta < 2097152 THEN 3
                  WHEN delta < 268435456 THEN 4
                  WHEN delta < 34359738368 THEN 5
                  ELSE 6 END AS nb
      FROM d)
    SELECT term, count(*)::BIGINT AS df, SUM(nb)::BIGINT AS bytes
    FROM b GROUP BY term
"""


# ---------------------------------------------------------------------------
# rfm_scores — NTILE(5) recency/frequency/monetary buckets
# ---------------------------------------------------------------------------

RFM_K = 5


def q_rfm_scores(sf_dir: str):
    """(c_custkey, r_tile, f_tile, m_tile): ascending NTILE(5) of
    last order day / order count / total cents, custkey tiebreak."""
    from oluray.pipelines.queries import _round_half_away

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice",
                    "o_orderdate"])

    def per_cust(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "c_custkey": df["o_custkey"].astype("int64"),
            "day": df["o_orderdate"].astype("datetime64[us]")
                .astype("int64") // 86_400_000_000,
            "n": np.ones(len(df), dtype=np.int64),
            "cents": _round_half_away(
                df["o_totalprice"].to_numpy(np.float64) * 100.0)})
        return g.groupby("c_custkey", as_index=False).agg(
            day=("day", "max"), n=("n", "sum"),
            cents=("cents", "sum"))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("c_custkey", as_index=False).agg(
            day=("day", "max"), n=("n", "sum"),
            cents=("cents", "sum"))
        g["g"] = np.int64(0)
        for c in ("c_custkey", "day", "n", "cents"):
            g[c] = g[c].astype("int64")
        return g

    cust = joins.grouped_agg(
        orders.map_batches(per_cust, batch_format="pandas"),
        ["c_custkey"], fold, num_partitions=8)

    out = joins.group_ntile(cust, ["g"], [("day", True),
                                          ("c_custkey", True)],
                            RFM_K, num_partitions=1)
    out = out.map_batches(
        lambda d: d.rename(columns={"tile": "r_tile"}),
        batch_format="pandas")
    out = joins.group_ntile(out, ["g"], [("n", True),
                                         ("c_custkey", True)],
                            RFM_K, num_partitions=1)
    out = out.map_batches(
        lambda d: d.rename(columns={"tile": "f_tile"}),
        batch_format="pandas")
    out = joins.group_ntile(out, ["g"], [("cents", True),
                                         ("c_custkey", True)],
                            RFM_K, num_partitions=1)
    return out.map_batches(
        lambda d: d.rename(columns={"tile": "m_tile"})[
            ["c_custkey", "r_tile", "f_tile", "m_tile"]],
        batch_format="pandas")


_RFM_SQL = f"""
    WITH c AS (
      SELECT o_custkey AS ck,
             max(epoch_us(o_orderdate::TIMESTAMP) // 86400000000)
               AS day,
             count(*)::BIGINT AS n,
             SUM(round(o_totalprice * 100.0, 0)::BIGINT)::BIGINT
               AS cents
      FROM orders GROUP BY o_custkey)
    SELECT ck AS c_custkey,
           NTILE({RFM_K}) OVER (ORDER BY day, ck)::BIGINT AS r_tile,
           NTILE({RFM_K}) OVER (ORDER BY n, ck)::BIGINT AS f_tile,
           NTILE({RFM_K}) OVER (ORDER BY cents, ck)::BIGINT AS m_tile
    FROM c
"""


QUERIES = {
    "postings_size": q_postings_size,
    "rfm_scores": q_rfm_scores,
}

ORACLE = {
    "postings_size": _POSTINGS_SQL,
    "rfm_scores": _RFM_SQL,
}
