"""Wave-7 catalog: BPE tokenizer APPLY, DGIM sliding-window counting,
and categorical focal-mode (majority) raster smoothing.

BPE-apply pairs with the wave-3 trainer (`text.bpe_merges`); DGIM adds
the sliding-window member to the sketch family (HLL / CMS / MP /
heavy-hitters); focal_mode is the categorical sibling of
`focal_median` — the majority filter of raster classification
pipelines. Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from oluray.functions import geo
from oluray.stages import joins, sketch, text


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# bpe_apply (rows-only; brute pytest)
# ---------------------------------------------------------------------------

BPE_APPLY_MERGES = 8


def q_bpe_apply(sf_dir: str):
    """Train-then-apply tokenizer round trip: learn the first 8 BPE
    merges over the corpus (`text.bpe_merges` — corpus pass once,
    merge loop over the vocab Dataset), then tokenize every document
    with the learned rules (`text.BpeApply` actor pool, per-actor
    word->length memo) and emit per-doc BPE token counts. Rows-only
    (the merge walk has no ANSI-SQL form); the pytest replays a
    sequential reference tokenizer on sample docs."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    merges_df = text.bpe_merges(docs, n_merges=BPE_APPLY_MERGES,
                                num_partitions=8)
    rules = list(zip(merges_df["left"].tolist(), merges_df["right"].tolist()))
    return docs.map_batches(
        text.BpeApply, fn_constructor_args=(rules,),
        batch_format="pandas", batch_size=256, concurrency=(1, 4))


# ---------------------------------------------------------------------------
# dgim_clicks (rows-only; error-bound pytest)
# ---------------------------------------------------------------------------

DGIM_WINDOW_US = 7 * 86_400_000_000  # last 7 days


def q_dgim_clicks(sf_dir: str):
    """DGIM sliding-window counter per user: approximate 'click'
    events in the trailing 7 days using O(log n) bucket state per key
    instead of storing events — the bounded-memory streaming counter
    (window aggregates like `rolling_24h` re-scan the window; DGIM is
    what survives when the window no longer fits). Per-user fold is
    inherently sequential (it IS the stream); users are partition-
    parallel. Emits (user_id, est_hits, exact_hits, n_buckets) — the
    exact column ships so downstream can audit the bound; at true
    scale it's dropped and the estimator stands alone."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    tmax = ev.select_columns(["ts"]).max("ts")  # A1-style scalar agg
    cutoff = int(pd.Timestamp(tmax).value // 1000) - DGIM_WINDOW_US

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                              "est_hits": pd.Series([], dtype="int64"),
                              "exact_hits": pd.Series([], dtype="int64"),
                              "n_buckets": pd.Series([], dtype="int64")})
        if len(df) == 0:
            return empty
        df = df[df["event_type"] == "click"]
        if len(df) == 0:
            return empty
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        tu = (df["ts"].astype("datetime64[us]").astype("int64").to_numpy())
        uid = df["user_id"].to_numpy(np.int64)
        rows = []
        start = 0
        for i in range(1, len(df) + 1):
            if i == len(df) or uid[i] != uid[start]:
                b: list[tuple[int, int]] = []
                for t in tu[start:i]:
                    b = sketch.dgim_update(b, int(t))
                est = sketch.dgim_query(b, cutoff)
                exact = int((tu[start:i] >= cutoff).sum())
                rows.append((int(uid[start]), est, exact, len(b)))
                start = i
        return pd.DataFrame(
            rows, columns=["user_id", "est_hits", "exact_hits", "n_buckets"]
        ).astype("int64")

    return joins.partitioned_map(ev, ["user_id"], per_user,
                                 num_partitions=16, pre_repartition=False)


# ---------------------------------------------------------------------------
# focal_mode — categorical 3x3 majority filter (oracle-backed)
# ---------------------------------------------------------------------------

FOCAL_MODE_RES = 5


def q_focal_mode(sf_dir: str):
    """3x3 focal MODE over the per-cell event-type histogram: for each
    occupied cell, the modal event_type of its 3x3 neighborhood (ties
    -> lexicographically smallest type) — the majority filter of
    raster classification smoothing, and the categorical sibling of
    `focal_median`. Same scatter/gather shape: per-(cell, type)
    counts scatter to 9 neighbors (amplifying the HISTOGRAM table,
    never events), gathered per target with a (max n, min type)
    winner pick; only occupied cells report."""
    ev = _read(sf_dir, "events", ["event_id", "event_type"])

    def xyt(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon, lat = geo.derive_lonlat(eid)
        cells = geo.cell_encode(lon, lat, FOCAL_MODE_RES)
        _, x, y = geo.cell_decode(cells)
        return pa.table({"x": pa.array(x), "y": pa.array(y),
                         "typ": t["event_type"]})

    pts = ev.map_batches(xyt, batch_format="pyarrow")

    def comb(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["x", "y", "typ"], as_index=False).size().rename(
            columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        return g

    def tot(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["x", "y", "typ"], as_index=False)["n"].sum()
        g["n"] = g["n"].astype("int64")
        return g

    cnt = joins.grouped_agg(
        pts.map_batches(comb, batch_format="pandas"), ["x", "y", "typ"],
        tot, num_partitions=8, pre_repartition=False).materialize()

    def scatter(df: pd.DataFrame) -> pd.DataFrame:
        x = df["x"].to_numpy(np.int64)
        y = df["y"].to_numpy(np.int64)
        outs = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                outs.append(pd.DataFrame({
                    "x": x + dx, "y": y + dy, "typ": df["typ"],
                    "n": df["n"].to_numpy(np.int64),
                    "own": np.full(len(df), dx == 0 and dy == 0)}))
        return pd.concat(outs, ignore_index=True)

    nb = cnt.map_batches(scatter, batch_format="pandas")

    def mode(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"x": pd.Series([], dtype="int64"),
                              "y": pd.Series([], dtype="int64"),
                              "mode_type": pd.Series([], dtype="object"),
                              "n_mode": pd.Series([], dtype="int64")})
        if len(df) == 0:
            return empty
        s = df.groupby(["x", "y", "typ"], as_index=False).agg(
            n=("n", "sum"), own=("own", "any"))
        occ = s.groupby(["x", "y"], as_index=False)["own"].any()
        occ = occ[occ["own"]][["x", "y"]]
        s = s.sort_values(["x", "y", "n", "typ"],
                          ascending=[True, True, False, True],
                          kind="mergesort")
        w = s.drop_duplicates(["x", "y"])
        w = w.merge(occ, on=["x", "y"])
        return pd.DataFrame({"x": w["x"].to_numpy(np.int64),
                             "y": w["y"].to_numpy(np.int64),
                             "mode_type": w["typ"].to_numpy(object),
                             "n_mode": w["n"].to_numpy(np.int64)})

    return joins.partitioned_map(nb, ["x", "y"], mode, num_partitions=8)


def _focal_mode_sql() -> str:
    lon, lat = geo.derive_lonlat_sql("event_id")
    x, y = geo.cell_xy_sql(lon, lat, FOCAL_MODE_RES)
    return f"""
WITH pts AS (SELECT {x} AS x, {y} AS y, event_type AS typ FROM events),
cnt AS (SELECT x, y, typ, count(*)::BIGINT AS n FROM pts GROUP BY 1, 2, 3),
occ AS (SELECT DISTINCT x, y FROM cnt),
nb AS (SELECT o.x AS x, o.y AS y, c.typ AS typ, sum(c.n)::BIGINT AS n
       FROM occ o
       CROSS JOIN (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                          (1,-1),(1,0),(1,1)) AS d(dx, dy)
       JOIN cnt c ON c.x = o.x + d.dx AND c.y = o.y + d.dy
       GROUP BY 1, 2, 3)
SELECT x, y, typ AS mode_type, n AS n_mode FROM (
  SELECT x, y, typ, n,
         row_number() OVER (PARTITION BY x, y
                            ORDER BY n DESC, typ ASC) AS rn
  FROM nb) WHERE rn = 1
"""


QUERIES = {
    "bpe_apply": q_bpe_apply,
    "dgim_clicks": q_dgim_clicks,
    "focal_mode": q_focal_mode,
}

ORACLE = {
    "focal_mode": _focal_mode_sql(),
}
