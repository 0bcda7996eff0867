"""Wave-22 catalog: positional phrase search, Kaplan-Meier survival
table, and per-node local clustering coefficient.

`phrase_search` is the inverted-index phrase query (search engines,
contamination screens): documents containing the exact token
sequence "hash join" — adjacency in token space, where tokens are
[a-z0-9]+ runs, i.e. the two words separated by one-or-more
non-alphanumerics. Counted per document with a compiled regex whose
semantics are EXACTLY token adjacency (the anchors forbid partial-
word matches, the separator class forbids intervening tokens), so
the DuckDB twin is the same RE2 pattern. Per-block vectorized
`Series.str.count`; output only matching docs.

`survival_table` is the Kaplan-Meier life table — THE
time-to-event primitive (churn, conversion, reliability): per user,
duration in whole days from first event to first purchase (observed)
or to the study end = global max ts (censored). Output one row per
distinct duration day: (day, n_risk, d_event, n_censor), all exact
BIGINTs — the product-limit estimate S(t) = prod(1 - d/n) is the
caller's fold, keeping the compare path rational. One corpus pass
through a per-user (min ts, min purchase ts) combiner; the day
regroup and the descending suffix-sum for n_risk run on
aggregate-sized tables.

`local_clustering` is the per-node clustering coefficient's exact
integer core: (node, deg, n_tri) over the interaction graph — LCC =
2*n_tri / (deg*(deg-1)) is the caller's division. Degree counts come
from the canonical distinct-edge set; triangle counts reuse the
distributed `_triangle_counts` machinery; the two align by a
union + grouped-sum (no outer-join plumbing).
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from oluray.stages import joins

PHRASE = ("hash", "join")
_PHRASE_RE = rf"\b{PHRASE[0]}[^a-z0-9]+{PHRASE[1]}\b"


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# phrase_search — exact token-adjacency phrase match
# ---------------------------------------------------------------------------


def q_phrase_search(sf_dir: str):
    """(doc_id, n_hits) for documents containing the phrase
    "hash join" as adjacent tokens; non-overlapping counts. Pure
    per-block map — no shuffle at all."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def hits(df: pd.DataFrame) -> pd.DataFrame:
        n = df["text"].str.count(_PHRASE_RE).astype("int64")
        keep = n > 0
        return pd.DataFrame({"doc_id": df["doc_id"][keep].astype("int64"),
                             "n_hits": n[keep]}).reset_index(drop=True)

    return docs.map_batches(hits, batch_format="pandas")


_PHRASE_SQL = f"""
    SELECT doc_id,
           length(regexp_extract_all(text, '{_PHRASE_RE}'))::BIGINT
             AS n_hits
    FROM documents
    WHERE regexp_matches(text, '{_PHRASE_RE}')
"""


# ---------------------------------------------------------------------------
# survival_table — Kaplan-Meier life table for time-to-first-purchase
# ---------------------------------------------------------------------------

_DAY_US = 86_400_000_000
_SENTINEL = np.int64(2**62)


def q_survival_table(sf_dir: str):
    """Per duration-day: number at risk, purchases observed,
    censored. Duration = whole days from the user's first event to
    their first purchase, censored at the global max event time."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype("int64")
        g = pd.DataFrame({"user_id": df["user_id"], "t0": us,
                          "tp": np.where(df["event_type"] == "purchase",
                                         us, _SENTINEL)})
        return g.groupby("user_id", as_index=False).min()

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", as_index=False)[["t0", "tp"]].min()

    users = joins.grouped_agg(ev, ["user_id"], fold, num_partitions=8,
                              combine_fn=combine).materialize()
    # study end: global max EVENT time (t0/tp are mins — a separate
    # tiny aggregate pass)
    tmax = int(ev.map_batches(
        lambda df: pd.DataFrame({"m": [df["ts"].astype("datetime64[us]")
                                       .astype("int64").max()]})
        if len(df) else pd.DataFrame({"m": pd.array([], dtype="int64")}),
        batch_format="pandas").max("m"))

    def day_rows(df: pd.DataFrame) -> pd.DataFrame:
        t0 = df["t0"].to_numpy(np.int64)
        tp = df["tp"].to_numpy(np.int64)
        observed = tp != _SENTINEL
        end = np.where(observed, tp, tmax)
        day = (end - t0) // _DAY_US
        g = pd.DataFrame({"day": day,
                          "d_event": observed.astype("int64"),
                          "n_censor": (~observed).astype("int64")})
        return g.groupby("day", as_index=False).sum()

    def day_fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("day", as_index=False)[["d_event",
                                               "n_censor"]].sum()
        for c in ("day", "d_event", "n_censor"):
            g[c] = g[c].astype("int64")
        return g

    days = joins.grouped_agg(
        users.map_batches(day_rows, batch_format="pandas"),
        ["day"], day_fold, num_partitions=4, pre_repartition=False)

    def risk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("day", ascending=False).reset_index(drop=True)
        df["n_risk"] = (df["d_event"] + df["n_censor"]).cumsum() \
            .astype("int64")
        return df[["day", "n_risk", "d_event", "n_censor"]] \
            .sort_values("day").reset_index(drop=True)

    # distinct duration days are bounded by the study span — a tiny
    # aggregate; the suffix-sum runs in one task
    return days.repartition(1).map_batches(risk, batch_format="pandas",
                                           batch_size=None)


_SURVIVAL_SQL = f"""
    WITH u AS (
      SELECT user_id, min(epoch_us(ts)) AS t0,
             min(CASE WHEN event_type = 'purchase'
                      THEN epoch_us(ts) END) AS tp
      FROM events GROUP BY user_id),
    g AS (SELECT max(epoch_us(ts)) AS tmax FROM events),
    d AS (SELECT CASE WHEN tp IS NOT NULL THEN (tp - t0) // {_DAY_US}
                      ELSE (tmax - t0) // {_DAY_US} END AS day,
                 CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS obs
          FROM u, g),
    s AS (SELECT day, SUM(obs)::BIGINT AS d_event,
                 SUM(1 - obs)::BIGINT AS n_censor,
                 count(*)::BIGINT AS n_tot
          FROM d GROUP BY day)
    SELECT day::BIGINT AS day,
           SUM(n_tot) OVER (ORDER BY day DESC)::BIGINT AS n_risk,
           d_event, n_censor
    FROM s
"""


# ---------------------------------------------------------------------------
# local_clustering — exact (deg, n_tri) per interaction-graph node
# ---------------------------------------------------------------------------


def q_local_clustering(sf_dir: str):
    """(node, deg, n_tri) for every node of the interaction graph
    (deg >= 1). Degree from the canonical distinct edge set; triangle
    incidences from the distributed triangle counter; aligned by
    union + grouped sum."""
    from oluray.pipelines.queries import (
        _interaction_edges, _triangle_counts,
    )

    e = _interaction_edges(sf_dir).materialize()

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        lo = np.minimum(df["a"].to_numpy(), df["b"].to_numpy())
        hi = np.maximum(df["a"].to_numpy(), df["b"].to_numpy())
        return pd.DataFrame({"lo": lo, "hi": hi}).drop_duplicates()

    ce = joins.distinct(
        e.map_batches(canon, batch_format="pandas"), ["lo", "hi"],
        num_partitions=8)

    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": np.concatenate([df["lo"].to_numpy(np.int64),
                                    df["hi"].to_numpy(np.int64)]),
            "deg": np.ones(2 * len(df), dtype=np.int64),
            "n_tri": np.zeros(2 * len(df), dtype=np.int64)})

    tri = _triangle_counts(e)

    def tri_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["node"].astype("int64"),
                             "deg": np.zeros(len(df), dtype=np.int64),
                             "n_tri": df["n_tri"].astype("int64")})

    both = ce.map_batches(endpoints, batch_format="pandas").union(
        tri.map_batches(tri_rows, batch_format="pandas"))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False)[["deg", "n_tri"]].sum()
        for c in ("node", "deg", "n_tri"):
            g[c] = g[c].astype("int64")
        return g

    return joins.grouped_agg(both, ["node"], fold, num_partitions=8,
                             pre_repartition=False)


# Local copy of queries._EDGES_CTE (importing it here at module init
# would be circular — queries.py imports this module last). The
# wave-22 pytest asserts the two strings stay identical.
_EDGES_CTE = """
    raw AS (
      SELECT user_id AS a,
             lead(user_id) OVER (PARTITION BY props
                                 ORDER BY ts, event_id) AS b,
             lead(ts) OVER (PARTITION BY props ORDER BY ts, event_id)
               - ts AS gap
      FROM events),
    edges AS (
      SELECT a, b FROM raw
      WHERE b IS NOT NULL AND gap <= INTERVAL 3600 SECOND AND a <> b)
"""


def _local_clustering_sql() -> str:
    return f"""
    WITH {_EDGES_CTE},
    canon AS (SELECT DISTINCT LEAST(a, b) AS lo, GREATEST(a, b) AS hi
              FROM edges),
    deg AS (SELECT node, count(*)::BIGINT AS deg FROM (
              SELECT lo AS node FROM canon
              UNION ALL SELECT hi FROM canon) GROUP BY node),
    tri AS (SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
            FROM canon e1
            JOIN canon e2 ON e2.lo = e1.hi
            JOIN canon e3 ON e3.lo = e1.lo AND e3.hi = e2.hi),
    tc AS (SELECT node, count(*)::BIGINT AS n_tri FROM (
             SELECT a AS node FROM tri
             UNION ALL SELECT b FROM tri
             UNION ALL SELECT c FROM tri) GROUP BY node)
    SELECT d.node, d.deg, COALESCE(tc.n_tri, 0)::BIGINT AS n_tri
    FROM deg d LEFT JOIN tc ON d.node = tc.node
    """


QUERIES = {
    "phrase_search": q_phrase_search,
    "survival_table": q_survival_table,
    "local_clustering": q_local_clustering,
}

ORACLE = {
    "phrase_search": _PHRASE_SQL,
    "survival_table": _SURVIVAL_SQL,
    "local_clustering": _local_clustering_sql(),
}
