"""Wave-40 catalog: Q-Q decile bands and binary join-count
statistics.

`qq_bands` is the quantile-quantile comparison (the distribution-
shift diagnostic PSI's buckets summarize): for each decile q, the
exact order statistics of n_chars for lang 'en' vs lang 'de' (the
`group_quantiles` convention: sorted index floor(q*(n-1))). Read
off per-lang (value, count) histograms — aggregate-sized, no
global sort; the oracle uses list_extract on sorted lists.

`join_counts` is the categorical sibling of Moran's I (join-count
statistics of spatial econometrics): cells are labeled B(lack) if
their event count exceeds the global per-occupied-cell median
(exact order statistic, lower median), W(hite) otherwise; adjacent
occupied pairs (rook, each pair once) are tallied as BB / WW / BW.
Clustered maps push BB+WW up, checkerboards push BW up. All counts
exact; the oracle replays the median and the neighbor join.
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from oluray.functions import geo
from oluray.stages import joins

QQ_LANG_A, QQ_LANG_B = "en", "de"
JC_RES = 5


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# qq_bands — per-decile order statistics for two languages
# ---------------------------------------------------------------------------


def q_qq_bands(sf_dir: str):
    """(decile, q_a, q_b): n_chars order statistic at index
    floor(d*0.1*(n-1)) for lang en (q_a) and de (q_b), d = 1..9."""
    docs = _read(sf_dir, "documents", ["lang", "n_chars"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        m = df["lang"].isin([QQ_LANG_A, QQ_LANG_B])
        g = pd.DataFrame({"lang": df["lang"][m],
                          "v": df["n_chars"][m],
                          "n": np.ones(int(m.sum()), dtype=np.int64)})
        return g.groupby(["lang", "v"], as_index=False)["n"].sum()

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "v"], as_index=False)["n"].sum()
        for c in ("v", "n"):
            g[c] = g[c].astype("int64")
        return g

    h = joins.grouped_agg(
        docs.map_batches(hist, batch_format="pandas"),
        ["lang"], fold, num_partitions=4)

    def bands(df: pd.DataFrame) -> pd.DataFrame:
        qs = {}
        for lang, sub in df.groupby("lang"):
            sub = sub.sort_values("v")
            cnt = sub["n"].to_numpy(np.int64)
            cum = np.cumsum(cnt)
            n = int(cum[-1])
            v = sub["v"].to_numpy(np.int64)
            qs[lang] = [int(v[np.searchsorted(
                cum, int(np.floor(d * 0.1 * (n - 1))) + 1)])
                for d in range(1, 10)]
        return pd.DataFrame({
            "decile": np.arange(1, 10, dtype=np.int64),
            "q_a": np.array(qs[QQ_LANG_A], dtype=np.int64),
            "q_b": np.array(qs[QQ_LANG_B], dtype=np.int64)})

    return h.repartition(1).map_batches(bands, batch_format="pandas",
                                        batch_size=None)


_QQ_SQL = f"""
    WITH la AS (
      SELECT list(n_chars ORDER BY n_chars) AS xs,
             count(*)::BIGINT AS n
      FROM documents WHERE lang = '{QQ_LANG_A}'),
    lb AS (
      SELECT list(n_chars ORDER BY n_chars) AS xs,
             count(*)::BIGINT AS n
      FROM documents WHERE lang = '{QQ_LANG_B}')
    SELECT d.i::BIGINT AS decile,
           list_extract(la.xs,
             CAST(floor(d.i * 0.1 * (la.n - 1)) AS BIGINT) + 1)
             ::BIGINT AS q_a,
           list_extract(lb.xs,
             CAST(floor(d.i * 0.1 * (lb.n - 1)) AS BIGINT) + 1)
             ::BIGINT AS q_b
    FROM range(1, 10) d(i), la, lb
"""


# ---------------------------------------------------------------------------
# join_counts — BB / WW / BW rook-adjacency tallies
# ---------------------------------------------------------------------------


def _jc_fold(df: pd.DataFrame) -> pd.DataFrame:
    """Single aggregate-sized task: lower-median split + rook pair
    tally. Module-level so the hand-checkerboard pytest drives the
    production kernel."""
    df = df.sort_values("cell").reset_index(drop=True)
    v = df["v"].to_numpy(np.int64)
    med = int(np.sort(v)[(len(v) - 1) // 2])  # lower median
    _, x, y = geo.cell_decode(df["cell"].to_numpy(np.int64))
    n = 1 << JC_RES
    grid = np.full((n, n), -1, dtype=np.int64)
    grid[y, x] = (v > med).astype(np.int64)  # 1 = Black
    bb = ww = bw = 0
    for dx, dy in ((1, 0), (0, 1)):  # each rook pair once
        a = grid[:n - dy if dy else n, :n - dx if dx else n]
        b = grid[dy:, dx:]
        both = (a >= 0) & (b >= 0)
        bb += int(((a == 1) & (b == 1) & both).sum())
        ww += int(((a == 0) & (b == 0) & both).sum())
        bw += int(((a != b) & both).sum())
    return pd.DataFrame([{"median_v": med, "n_bb": bb,
                          "n_ww": ww, "n_bw": bw}])


def q_join_counts(sf_dir: str):
    """One row (median_v, n_bb, n_ww, n_bw): lower-median split of
    occupied res-5 cell counts, rook pairs each counted once. The
    occupied-cell table is aggregate-sized; the tally is one task."""
    from oluray.pipelines.queries_wave18 import _event_cell_counts

    counts = _event_cell_counts(sf_dir, JC_RES)
    return counts.repartition(1).map_batches(
        _jc_fold, batch_format="pandas", batch_size=None)


def _join_counts_sql() -> str:
    lon, lat = geo.derive_lonlat_sql("event_id")
    x, y = geo.cell_xy_sql(lon, lat, JC_RES)
    return f"""
    WITH c AS (
      SELECT x, y, count(*)::BIGINT AS v
      FROM (SELECT {x} AS x, {y} AS y FROM events) GROUP BY x, y),
    m AS (
      SELECT list_extract(list(v ORDER BY v),
               CAST((count(*) - 1) // 2 AS BIGINT) + 1) AS med
      FROM c),
    lab AS (SELECT x, y,
                   CASE WHEN v > m.med THEN 1 ELSE 0 END AS b
            FROM c, m),
    pr AS (
      SELECT a.b AS ba, t.b AS bb_
      FROM lab a JOIN lab t
        ON (t.x = a.x + 1 AND t.y = a.y)
        OR (t.x = a.x AND t.y = a.y + 1))
    SELECT (SELECT med FROM m)::BIGINT AS median_v,
           SUM(CASE WHEN ba = 1 AND bb_ = 1 THEN 1 ELSE 0 END)
             ::BIGINT AS n_bb,
           SUM(CASE WHEN ba = 0 AND bb_ = 0 THEN 1 ELSE 0 END)
             ::BIGINT AS n_ww,
           SUM(CASE WHEN ba <> bb_ THEN 1 ELSE 0 END)::BIGINT AS n_bw
    FROM pr
    """


QUERIES = {
    "qq_bands": q_qq_bands,
    "join_counts": q_join_counts,
}

ORACLE = {
    "qq_bands": _QQ_SQL,
    "join_counts": _join_counts_sql(),
}
