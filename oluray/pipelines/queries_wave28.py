"""Wave-28 catalog: delta-join incremental view maintenance and
per-cluster top-term naming.

`ivm_join` is JOIN-view incremental maintenance — the streaming-
engine identity the reference's whole update loop is an instance of
(apply a diff without recomputing the world): with base and delta
partitions of both inputs, the view delta is the three-term rule
d(A join B) = dA*B0 + A0*dB + dA*dB, and the maintained view is
base-view UNION the three deltas. The engine composes exactly that
(three partial hash joins, each shuffling only delta-proportional
rows against the touched side); the oracle — and the pytest cross-
check — is the monolithic full join, which must be row-identical.
Mirrors /root/reference/src/osm/OsmChangeHandler.cpp:444-590's
delete+insert semantics re-expressed as algebraic view deltas.

`cluster_terms` is cluster naming (the top2vec/topic-label step of
every embedding-clustering pipeline): per embedding label, the
top-3 tokens by within-cluster document frequency (ties:
lexicographic). A doc's text lives in one row, so doc-distinct
terms are row-local; only (label, term, partial-df) count rows
shuffle. Tokenization matches the established corpus twin
(lower + split on [^a-z]+, the `vocab_df` contract).
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data

from oluray.stages import joins


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# ivm_join — three-term delta rule for a join view
# ---------------------------------------------------------------------------

ORD_MOD = 10   # orders with key % 10 == 0 form the delta batch
CUST_MOD = 7   # customers with key % 7 == 0 form the delta batch


def _split(ds: ray.data.Dataset, col: str, mod: int):
    def part(df: pd.DataFrame, want_delta: bool) -> pd.DataFrame:
        m = (df[col] % mod) == 0
        return df[m if want_delta else ~m]

    base = ds.map_batches(lambda d: part(d, False),
                          batch_format="pandas")
    delta = ds.map_batches(lambda d: part(d, True),
                           batch_format="pandas")
    return base, delta


def q_ivm_join(sf_dir: str):
    """Maintained join view (o_orderkey, o_custkey, c_nationkey):
    base-view plus the three delta terms. Row-identical to the
    monolithic join (the oracle); each delta join touches only
    delta-proportional rows."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    o_base, o_delta = _split(orders, "o_orderkey", ORD_MOD)
    c_base, c_delta = _split(cust, "c_custkey", CUST_MOD)

    def j(a, b):
        out = joins.hash_join(
            a.map_batches(
                lambda d: d.rename(columns={"o_custkey": "c_custkey"}),
                batch_format="pandas"),
            b, "c_custkey", num_partitions=8)
        return out.map_batches(
            lambda d: pd.DataFrame({
                "o_orderkey": d["o_orderkey"].astype("int64"),
                "o_custkey": d["c_custkey"].astype("int64"),
                "c_nationkey": d["c_nationkey"].astype("int64")}),
            batch_format="pandas")

    base_view = j(o_base, c_base)
    d1 = j(o_delta, c_base)   # dA * B0
    d2 = j(o_base, c_delta)   # A0 * dB
    d3 = j(o_delta, c_delta)  # dA * dB
    return base_view.union(d1).union(d2).union(d3)


_IVM_SQL = """
    SELECT o_orderkey, o_custkey, c_nationkey
    FROM orders JOIN customer ON o_custkey = c_custkey
"""


# ---------------------------------------------------------------------------
# cluster_terms — top-3 df terms per embedding label
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"[^a-z]+")
TOP_TERMS = 3


def q_cluster_terms(sf_dir: str):
    """(label, term, df) — the 3 highest-document-frequency tokens of
    each embedding cluster (ties: lexicographic). Doc-distinct terms
    are row-local; only count rows shuffle."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    emb = _read(sf_dir, "embeddings", ["vec_id", "label"])
    lab = emb.map_batches(
        lambda d: pd.DataFrame({"doc_id": d["vec_id"].astype("int64"),
                                "label": d["label"].astype("int64")}),
        batch_format="pandas")
    j = joins.hash_join(docs, lab, "doc_id", num_partitions=8)

    def doc_terms(df: pd.DataFrame) -> pd.DataFrame:
        rows_label, rows_term = [], []
        for lbl, txt in zip(df["label"].to_numpy(),
                            df["text"].to_numpy()):
            terms = {t for t in _TOKEN_RE.split(str(txt).lower()) if t}
            rows_label.extend([int(lbl)] * len(terms))
            rows_term.extend(sorted(terms))
        g = pd.DataFrame({"label": rows_label, "term": rows_term,
                          "df": np.ones(len(rows_term),
                                        dtype=np.int64)})
        return g.groupby(["label", "term"], as_index=False)["df"].sum()

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["label", "term"], as_index=False)["df"].sum()
        g = g.sort_values(["label", "df", "term"],
                          ascending=[True, False, True])
        out = g.groupby("label", sort=False).head(TOP_TERMS)
        out["df"] = out["df"].astype("int64")
        out["label"] = out["label"].astype("int64")
        return out.reset_index(drop=True)

    return joins.grouped_agg(
        j.map_batches(doc_terms, batch_format="pandas"),
        ["label"], topk, num_partitions=4, pre_repartition=False)


_CLUSTER_TERMS_SQL = f"""
    WITH lab AS (
      SELECT doc_id, label, text
      FROM documents JOIN (SELECT vec_id, label FROM embeddings)
        ON doc_id = vec_id),
    tok AS (
      SELECT DISTINCT label, doc_id,
             unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
      FROM lab),
    df AS (SELECT label::BIGINT AS label, term,
                  count(*)::BIGINT AS df
           FROM tok WHERE term <> '' GROUP BY label, term)
    SELECT label, term, df FROM df
    QUALIFY row_number() OVER (PARTITION BY label
                               ORDER BY df DESC, term) <= {TOP_TERMS}
"""


QUERIES = {
    "ivm_join": q_ivm_join,
    "cluster_terms": q_cluster_terms,
}

ORACLE = {
    "ivm_join": _IVM_SQL,
    "cluster_terms": _CLUSTER_TERMS_SQL,
}
