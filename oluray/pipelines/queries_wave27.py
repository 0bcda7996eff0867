"""Wave-27 catalog: Cohen's kappa agreement, z-order range-scan
planning, and stratified k-fold assignment.

`cohens_kappa` is the chance-corrected agreement statistic between
the engine's language-ID predictions (`text.LangId`, already
SQL-twinned) and the ground-truth lang column, reduced to exact
BIGINTs: kappa = (n*agree - cross) / (n^2 - cross) with
cross = sum over labels of rowtotal*coltotal — the division is the
caller's. One corpus pass through a (true, pred) contingency
combiner; the fold runs on the label-bounded table.

`zrange_plan` is the z-order range decomposition a tiled store
needs to answer a bbox query with block pruning (the BIGMIN idea):
the data-derived bbox (purchase events' occupied extent at res 6)
is enumerated, Morton-coded, and merged into maximal CONSECUTIVE
z-intervals — exactly the intervals a z-sorted Parquet layout scans
contiguously. Interval merging is the gaps-and-islands trick
(z - rank is constant within a run) both in the engine fold and the
SQL twin.

`stratified_kfold` is the deterministic stratified CV split: fold =
(rank of doc within its lang, by doc_id) mod 5 — every fold gets an
equal share of every stratum, reproducible with no RNG. Per-lang
partition rank, vectorized.
Registered by ``oluray.pipelines.queries``.
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
# cohens_kappa — exact agreement components: langid prediction vs truth
# ---------------------------------------------------------------------------


_LANGID_CACHE: list = []


def q_cohens_kappa(sf_dir: str):
    """One row (n, agree, cross): n docs, exact agreement count, and
    the chance-agreement cross term sum_l(rowtot_l * coltot_l).
    kappa = (n*agree - cross) / (n*n - cross)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if not _LANGID_CACHE:  # compile marker regexes once per worker
            _LANGID_CACHE.append(text.LangId())
        pred = _LANGID_CACHE[0](df[["doc_id", "text"]])["pred_lang"]
        g = pd.DataFrame({"t": df["lang"].to_numpy(),
                          "p": pred.to_numpy(),
                          "c": np.ones(len(df), dtype=np.int64)})
        return g.groupby(["t", "p"], as_index=False)["c"].sum()

    cont = joins.grouped_agg(
        docs, ["t"],
        lambda df: df.groupby(["t", "p"], as_index=False)["c"].sum(),
        num_partitions=4, combine_fn=combine).to_pandas()
    n = int(cont["c"].sum())
    agree = int(cont.loc[cont["t"] == cont["p"], "c"].sum())
    rt = cont.groupby("t")["c"].sum()
    ct = cont.groupby("p")["c"].sum()
    labels = set(rt.index) | set(ct.index)
    cross = sum(int(rt.get(l, 0)) * int(ct.get(l, 0)) for l in labels)
    return pd.DataFrame([{"n": n, "agree": agree, "cross": cross}])


def _kappa_sql() -> str:
    return f"""
    WITH p AS (
      SELECT lang AS t, pred_lang AS p FROM (
        SELECT lang, {text.langid_sql()} FROM documents)),
    cont AS (SELECT t, p, count(*)::BIGINT AS c FROM p GROUP BY t, p),
    rt AS (SELECT t AS l, SUM(c)::BIGINT AS r FROM cont GROUP BY t),
    ct AS (SELECT p AS l, SUM(c)::BIGINT AS k FROM cont GROUP BY p)
    SELECT (SELECT SUM(c) FROM cont)::BIGINT AS n,
           (SELECT COALESCE(SUM(c), 0) FROM cont WHERE t = p)::BIGINT
             AS agree,
           (SELECT COALESCE(SUM(COALESCE(r, 0) * COALESCE(k, 0)), 0)
            FROM rt FULL OUTER JOIN ct USING (l))::BIGINT AS cross
    """


# ---------------------------------------------------------------------------
# zrange_plan — maximal consecutive z-intervals covering the bbox
# ---------------------------------------------------------------------------

ZPLAN_RES = 6


def _z_islands(df: pd.DataFrame) -> pd.DataFrame:
    """Single task: given distinct morton codes of the bbox lattice,
    merge consecutive codes into maximal intervals (z - rank constant
    within a run). Input (z,); output (z_lo, z_hi, n_cells)."""
    z = np.sort(np.unique(df["z"].to_numpy(np.int64)))
    if len(z) == 0:
        return pd.DataFrame({"z_lo": pd.Series([], dtype="int64"),
                             "z_hi": pd.Series([], dtype="int64"),
                             "n_cells": pd.Series([], dtype="int64")})
    grp = z - np.arange(len(z), dtype=np.int64)
    g = pd.DataFrame({"z": z, "g": grp}).groupby("g", as_index=False) \
        .agg(z_lo=("z", "min"), z_hi=("z", "max"),
             n_cells=("z", "size"))
    out = g[["z_lo", "z_hi", "n_cells"]].astype("int64")
    return out.sort_values("z_lo").reset_index(drop=True)


def q_zrange_plan(sf_dir: str):
    """The z-interval scan plan for the purchase-extent bbox: bbox =
    min/max grid coords of cells holding >= 1 purchase event at
    res 6; every lattice cell in the bbox is Morton-coded and merged
    into maximal consecutive intervals. The bbox lattice is
    4^res-bounded, so enumeration + merge run in one task; the bbox
    itself is a tiny distributed aggregate."""
    from oluray.pipelines.queries import _with_points

    ev = _read(sf_dir, "events", ["event_id", "event_type"])
    pts = _with_points(ev, "event_id")

    def xy(t: pa.Table) -> pa.Table:
        mask = pa.compute.equal(t["event_type"], "purchase")
        t = t.filter(mask)
        c = geo.cell_encode(
            t["lon"].to_numpy(zero_copy_only=False),
            t["lat"].to_numpy(zero_copy_only=False), ZPLAN_RES)
        rem = c - np.int64(ZPLAN_RES) * np.int64(geo.RES_SHIFT)
        y, x = rem // np.int64(geo.Y_SHIFT), rem % np.int64(geo.Y_SHIFT)
        if len(x) == 0:
            return pa.table({"x0": pa.array([], pa.int64()),
                             "x1": pa.array([], pa.int64()),
                             "y0": pa.array([], pa.int64()),
                             "y1": pa.array([], pa.int64())})
        return pa.table({"x0": pa.array([int(x.min())]),
                         "x1": pa.array([int(x.max())]),
                         "y0": pa.array([int(y.min())]),
                         "y1": pa.array([int(y.max())])})

    def plan(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return _z_islands(pd.DataFrame({"z": pd.Series(
                [], dtype="int64")}))
        x0, x1 = int(df["x0"].min()), int(df["x1"].max())
        y0, y1 = int(df["y0"].min()), int(df["y1"].max())
        xs, ys = np.meshgrid(np.arange(x0, x1 + 1, dtype=np.int64),
                             np.arange(y0, y1 + 1, dtype=np.int64))
        cells = (np.int64(ZPLAN_RES) * np.int64(geo.RES_SHIFT)
                 + ys.ravel() * np.int64(geo.Y_SHIFT) + xs.ravel())
        return _z_islands(pd.DataFrame({"z": geo.morton_code(cells)}))

    # per-block extents fold to one row; enumeration + merge stay in
    # a task (the bbox lattice is 4^res-bounded)
    return pts.map_batches(xy, batch_format="pyarrow") \
        .repartition(1).map_batches(plan, batch_format="pandas",
                                    batch_size=None)


def _zplan_sql() -> str:
    lon, lat = geo.derive_lonlat_sql("event_id")
    x, y = geo.cell_xy_sql(lon, lat, ZPLAN_RES)
    z = geo.morton_sql("g.x", "g.y", ZPLAN_RES)
    return f"""
    WITH pur AS (
      SELECT {x} AS x, {y} AS y FROM events
      WHERE event_type = 'purchase'),
    ext AS (SELECT min(x) AS x0, max(x) AS x1, min(y) AS y0,
                   max(y) AS y1 FROM pur),
    g AS (SELECT gx.range AS x, gy.range AS y
          FROM range(0, {1 << ZPLAN_RES}) gx(range),
               range(0, {1 << ZPLAN_RES}) gy(range), ext
          WHERE gx.range BETWEEN ext.x0 AND ext.x1
            AND gy.range BETWEEN ext.y0 AND ext.y1),
    z AS (SELECT {z} AS z FROM g),
    r AS (SELECT z, z - row_number() OVER (ORDER BY z) AS grp FROM z)
    SELECT min(z)::BIGINT AS z_lo, max(z)::BIGINT AS z_hi,
           count(*)::BIGINT AS n_cells
    FROM r GROUP BY grp
    """


# ---------------------------------------------------------------------------
# stratified_kfold — deterministic stratified CV assignment
# ---------------------------------------------------------------------------

KFOLD = 5


def q_stratified_kfold(sf_dir: str):
    """(doc_id, fold): fold = rank within lang (by doc_id) mod 5.
    Per-lang hash partition, one vectorized argsort per partition."""
    docs = _read(sf_dir, "documents", ["doc_id", "lang"])

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["lang", "doc_id"]).reset_index(drop=True)
        rank = df.groupby("lang", sort=False).cumcount()
        return pd.DataFrame({"doc_id": df["doc_id"].astype("int64"),
                             "fold": (rank % KFOLD).astype("int64")})

    return joins.partitioned_map(docs, ["lang"], assign,
                                 num_partitions=4)


_KFOLD_SQL = f"""
    SELECT doc_id,
           ((row_number() OVER (PARTITION BY lang ORDER BY doc_id)
             - 1) % {KFOLD})::BIGINT AS fold
    FROM documents
"""


QUERIES = {
    "cohens_kappa": q_cohens_kappa,
    "zrange_plan": q_zrange_plan,
    "stratified_kfold": q_stratified_kfold,
}

ORACLE = {
    "cohens_kappa": _kappa_sql(),
    "zrange_plan": _zplan_sql(),
    "stratified_kfold": _KFOLD_SQL,
}
