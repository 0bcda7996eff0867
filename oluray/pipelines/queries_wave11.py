"""Wave-11 catalog: exact sparse dot-product retrieval, trajectory
turn-direction statistics, exact two-sample Kolmogorov-Smirnov.

`sparse_topk` is the exact inverted-index retrieval sibling of the
LSH/IVF dense-ANN family: integer tf dot products over only the
query's posting lists, ranked by an integer-scaled squared-cosine —
bit-for-bit oracle-matchable. `turn_counts` extends the trajectory
family (speed, stays, corridors, crossings) with direction analysis
(signed cross-product turns). `ks_test` extends the statistics family
(chi2, Moran's I, correlation) with the classic distribution-equality
test, computed EXACTLY in scaled integers. Registered by
``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from oluray.functions import geo
from oluray.stages import joins, text


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# sparse_topk — exact tf dot-product retrieval vs one query document
# ---------------------------------------------------------------------------

SPARSE_QDOC = 0
SPARSE_K = 20


def q_sparse_topk(sf_dir: str):
    """Exact sparse-vector retrieval: rank the corpus against ONE
    query document by integer tf dot products over the query's
    posting lists — the inverted-index exact complement of the
    LSH/IVF approximate family. Similarity is the integer-scaled
    squared cosine score_e9 = dot^2 * 1e9 // (|q|^2 * |d|^2): no
    sqrt, no float, so DuckDB reproduces it bit-for-bit and the
    top-k cutoff is deterministic under the (score, doc_id)
    tie-break. The query vector is one document's term counts
    (bounded by one doc's vocabulary — the only driver-side object);
    corpus postings stream through two grouped passes."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    toks = text.explode_terms(docs).materialize()

    def tf_agg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["doc_id", "term"], as_index=False).size()
        return g.rename(columns={"size": "tf"})

    tf = joins.partitioned_map(toks, ["doc_id"], tf_agg,
                               num_partitions=8).materialize()

    # query vector: ONE doc's tf rows (bounded by its vocabulary)
    qv = (tf.map_batches(
        lambda d: d[d["doc_id"] == SPARSE_QDOC],
        batch_format="pandas").to_pandas())
    qtf = dict(zip(qv["term"], qv["tf"].astype(np.int64)))
    qnorm2 = int((qv["tf"].astype(np.int64) ** 2).sum())

    def dots(df: pd.DataFrame) -> pd.DataFrame:
        part = df.assign(
            d=(df["term"].map(qtf).fillna(0).astype(np.int64)
               * df["tf"].astype(np.int64)),
            n2=df["tf"].astype(np.int64) ** 2)
        g = part.groupby("doc_id", as_index=False)[["d", "n2"]].sum()
        return g

    def dots_total(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("doc_id", as_index=False)[["d", "n2"]].sum()

    per_doc = joins.grouped_agg(tf, ["doc_id"], dots_total,
                                num_partitions=8, combine_fn=dots)

    def score(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        n2 = t["n2"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (d > 0) & (did != SPARSE_QDOC)
        did, d, n2 = did[keep], d[keep], n2[keep]
        s = d * d * 1_000_000_000 // (qnorm2 * n2)
        return pa.table({"doc_id": pa.array(did), "dot": pa.array(d),
                         "score_e9": pa.array(s)})

    scored = per_doc.map_batches(score, batch_format="pyarrow")
    return scored.sort(["score_e9", "doc_id"],
                       descending=[True, False]).limit(SPARSE_K)


def _sparse_topk_sql() -> str:
    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
       FROM tok WHERE term <> '' GROUP BY doc_id, term),
q AS (SELECT term, tf AS qtf FROM tf WHERE doc_id = {SPARSE_QDOC}),
qn AS (SELECT sum(qtf * qtf)::BIGINT AS qnorm2 FROM q),
n AS (SELECT doc_id, sum(tf * tf)::BIGINT AS n2 FROM tf GROUP BY doc_id),
d AS (SELECT tf.doc_id, sum(tf.tf * q.qtf)::BIGINT AS dot
      FROM tf JOIN q USING (term) GROUP BY tf.doc_id)
SELECT d.doc_id, d.dot,
       (d.dot * d.dot * 1000000000 // (qn.qnorm2 * n.n2))::BIGINT
         AS score_e9
FROM d JOIN n USING (doc_id) CROSS JOIN qn
WHERE d.dot > 0 AND d.doc_id <> {SPARSE_QDOC}
ORDER BY score_e9 DESC, d.doc_id
LIMIT {SPARSE_K}
"""


# ---------------------------------------------------------------------------
# turn_counts — signed-turn statistics per user trajectory
# ---------------------------------------------------------------------------


def q_turn_counts(sf_dir: str):
    """Turn-direction statistics per user trajectory: for every
    consecutive point triple (ordered by ts, event_id), the sign of
    the displacement cross product (p1-p0) x (p2-p1) classifies the
    step as a left turn, right turn, or collinear. Direction analysis
    complements the trajectory family's magnitude operators
    (track_speed / track_length / stays): a vehicle circling a block
    and one driving straight have identical speed profiles but
    opposite turn signatures. Float ops are mirrored op-for-op in the
    SQL oracle (the segment-crossing exact-IEEE contract); one
    user-hash partition pass, vectorized shifts inside."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def pts(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon, lat = geo.derive_lonlat(eid)
        return pa.table({
            "event_id": pa.array(eid),
            "user_id": pa.array(t["user_id"].to_numpy(
                zero_copy_only=False).astype(np.int64)),
            "tus": pa.array(t["ts"].to_pandas()
                            .astype("datetime64[us]").astype("int64")
                            .to_numpy()),
            "lon": pa.array(lon), "lat": pa.array(lat)})

    p = ev.map_batches(pts, batch_format="pyarrow")

    def turns(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "n_left": pd.Series([], dtype="int64"),
            "n_right": pd.Series([], dtype="int64"),
            "n_straight": pd.Series([], dtype="int64")})
        if len(df) == 0:
            return empty
        df = df.sort_values(["user_id", "tus", "event_id"],
                            kind="mergesort").reset_index(drop=True)
        uid = df["user_id"].to_numpy(np.int64)
        x = df["lon"].to_numpy(np.float64)
        y = df["lat"].to_numpy(np.float64)
        # triples entirely within one user (same-uid at lag 1 and 2)
        ok = np.zeros(len(df), dtype=bool)
        if len(df) >= 3:
            ok[2:] = (uid[2:] == uid[1:-1]) & (uid[1:-1] == uid[:-2])
        x0 = np.roll(x, 2)
        y0 = np.roll(y, 2)
        x1 = np.roll(x, 1)
        y1 = np.roll(y, 1)
        cross = (x1 - x0) * (y - y1) - (y1 - y0) * (x - x1)
        left = ok & (cross > 0.0)
        right = ok & (cross < 0.0)
        straight = ok & (cross == 0.0)
        out = pd.DataFrame({
            "user_id": uid,
            "l": left.astype(np.int64), "r": right.astype(np.int64),
            "s": straight.astype(np.int64)})
        g = out.groupby("user_id", as_index=False)[["l", "r", "s"]].sum()
        return g.rename(columns={"l": "n_left", "r": "n_right",
                                 "s": "n_straight"})

    return joins.partitioned_map(p, ["user_id"], turns,
                                 num_partitions=8)


def _turn_counts_sql() -> str:
    lon, lat = geo.derive_lonlat_sql("event_id")
    return f"""
WITH p AS (
  SELECT user_id, ts, event_id, {lon} AS x, {lat} AS y FROM events),
w AS (
  SELECT user_id,
         lag(x, 2) OVER win AS x0, lag(y, 2) OVER win AS y0,
         lag(x, 1) OVER win AS x1, lag(y, 1) OVER win AS y1,
         x AS x2, y AS y2
  FROM p WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)),
c AS (
  SELECT user_id,
         ((x1 - x0) * (y2 - y1) - (y1 - y0) * (x2 - x1)) AS cr
  FROM w WHERE x0 IS NOT NULL)
SELECT user_id,
       sum(CASE WHEN cr > 0.0 THEN 1 ELSE 0 END)::BIGINT AS n_left,
       sum(CASE WHEN cr < 0.0 THEN 1 ELSE 0 END)::BIGINT AS n_right,
       sum(CASE WHEN cr = 0.0 THEN 1 ELSE 0 END)::BIGINT AS n_straight
FROM c GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# ks_test — exact two-sample Kolmogorov-Smirnov distance
# ---------------------------------------------------------------------------


def q_ks_test(sf_dir: str):
    """EXACT two-sample Kolmogorov-Smirnov distance between the value
    distributions of click vs purchase events, in scaled integers:
    D * n1 * n2 = max over thresholds |cum1 * n2 - cum2 * n1| — no
    float ECDF ever forms, so the oracle matches bit-for-bit. The
    distributed part is a per-value-cents histogram (combiner shuffle
    bounded by DISTINCT price points, ~2e4 here); the final cumulative
    max runs once over that aggregate-sized histogram (documented
    driver-side finish — the same bound as the `histogram` family;
    range-partitioned prefix scan is the growth path)."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def hist(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        vc = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)).astype(
            np.int64)
        is_a = et == "click"
        is_b = et == "purchase"
        keep = is_a | is_b
        df = pd.DataFrame({"v": vc[keep],
                           "ca": is_a[keep].astype(np.int64),
                           "cb": is_b[keep].astype(np.int64)})
        g = df.groupby("v", as_index=False)[["ca", "cb"]].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def hsum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("v", as_index=False)[["ca", "cb"]].sum()

    h = joins.grouped_agg(ev.map_batches(hist, batch_format="pyarrow"),
                          ["v"], hsum, num_partitions=8).to_pandas()
    h = h.sort_values("v").reset_index(drop=True)
    n1 = int(h["ca"].sum())
    n2 = int(h["cb"].sum())
    c1 = h["ca"].cumsum().to_numpy(np.int64)
    c2 = h["cb"].cumsum().to_numpy(np.int64)
    d_num = int(np.abs(c1 * n2 - c2 * n1).max()) if len(h) else 0
    return pd.DataFrame({
        "n1": [n1], "n2": [n2], "d_num": [d_num],
        "d_e6": [d_num * 1_000_000 // (n1 * n2) if n1 and n2 else 0],
    }).astype("int64")


_KS_SQL = """
WITH u AS (
  SELECT round(value * 100.0)::BIGINT AS v,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ca,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS cb
  FROM events WHERE event_type IN ('click', 'purchase')),
n AS (SELECT sum(ca)::BIGINT AS n1, sum(cb)::BIGINT AS n2 FROM u),
c AS (SELECT v, sum(sum(ca)) OVER (ORDER BY v) AS c1,
             sum(sum(cb)) OVER (ORDER BY v) AS c2
      FROM u GROUP BY v)
SELECT n1, n2,
       max(abs(c1 * n2 - c2 * n1))::BIGINT AS d_num,
       (max(abs(c1 * n2 - c2 * n1)) * 1000000 // (n1 * n2))::BIGINT AS d_e6
FROM c CROSS JOIN n GROUP BY n1, n2
"""


QUERIES = {
    "sparse_topk": q_sparse_topk,
    "turn_counts": q_turn_counts,
    "ks_test": q_ks_test,
}

ORACLE = {
    "sparse_topk": _sparse_topk_sql(),
    "turn_counts": _turn_counts_sql(),
    "ks_test": _KS_SQL,
}
