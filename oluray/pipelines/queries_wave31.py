"""Wave-31 catalog: PSI drift buckets, lattice percolation sweep,
and optimal k-segmentation of the daily series.

`psi_buckets` is the Population Stability Index's exact core — THE
model-monitoring drift metric: global decile boundaries of n_chars
(the discrete quantile convention `group_quantiles` established:
sorted index floor(q*(n-1))), then per-bucket counts of the two
populations (sources src0-2 vs rest, the `auc_score` split). The
PSI fold sum((a-b)*ln(a/b)) is the caller's. Boundaries come from
the exact (value, count) histogram — distinct n_chars values are
aggregate-sized, so the order statistics need no global sort.

`percolation_sweep` is the lattice-connectivity phase screen: for
each occupancy threshold k, the number of active cells (count >= k)
and of 4-connected components they form — how a hotspot map
fragments as the threshold rises. Runs on the aggregate raster with
the wave-29 union-find labeler; rows-only (per-k flood fill is not
SQL), brute flood-fill verified.

`segment_series` is optimal 1-D k-segmentation (changepoint
detection by exact DP, the offline Bellman form): partition the
daily event-count series into 3 contiguous segments minimizing
total within-segment SSE. Prefix-moment costs, O(k n^2) DP on the
aggregate-sized day series; rows-only, verified against an
exhaustive two-breakpoint brute search.
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from oluray.stages import joins

PSI_POS_SOURCES = ("src0", "src1", "src2")
PSI_DECILES = 9  # boundaries at q = 0.1 .. 0.9


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# psi_buckets — decile-bucket counts for the two populations
# ---------------------------------------------------------------------------


def q_psi_buckets(sf_dir: str):
    """(bucket, n_a, n_b): bucket = #global decile boundaries
    strictly below the doc's n_chars (0..9); n_a = src0-2 docs,
    n_b = rest. Boundaries are exact order statistics read off the
    distributed (value, count) histogram — no global sort."""
    docs = _read(sf_dir, "documents", ["source", "n_chars"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        pos = df["source"].isin(PSI_POS_SOURCES)
        g = pd.DataFrame({"v": df["n_chars"],
                          "n_a": pos.astype("int64"),
                          "n_b": (~pos).astype("int64")})
        return g.groupby("v", as_index=False)[["n_a", "n_b"]].sum()

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("v", as_index=False)[["n_a", "n_b"]].sum()
        for c in ("v", "n_a", "n_b"):
            g[c] = g[c].astype("int64")
        return g

    h = joins.grouped_agg(
        docs.map_batches(hist, batch_format="pandas"),
        ["v"], fold, num_partitions=4, pre_repartition=False)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("v").reset_index(drop=True)
        cnt = (df["n_a"] + df["n_b"]).to_numpy(np.int64)
        cum = np.cumsum(cnt)
        n = int(cum[-1]) if len(cum) else 0
        v = df["v"].to_numpy(np.int64)
        # boundary_q = value at sorted index floor(q*(n-1)) — the
        # group_quantiles convention, read from the histogram
        bounds = []
        for i in range(1, PSI_DECILES + 1):
            idx = int(np.floor(i * 0.1 * (n - 1)))
            bounds.append(int(v[np.searchsorted(cum, idx + 1)]))
        b = np.array(bounds, dtype=np.int64)
        bucket = np.searchsorted(b, v, side="left")  # #{bounds < v}
        g = pd.DataFrame({"bucket": bucket.astype("int64"),
                          "n_a": df["n_a"], "n_b": df["n_b"]})
        out = g.groupby("bucket", as_index=False)[["n_a", "n_b"]].sum()
        for c in ("bucket", "n_a", "n_b"):
            out[c] = out[c].astype("int64")
        return out

    # the value histogram is aggregate-sized; boundary extraction +
    # bucket regroup run in one task
    return h.repartition(1).map_batches(bucketize,
                                        batch_format="pandas",
                                        batch_size=None)


def _psi_sql() -> str:
    pos = ", ".join(f"'{s}'" for s in PSI_POS_SOURCES)
    return f"""
    WITH l AS (
      SELECT list(n_chars ORDER BY n_chars) AS xs,
             count(*)::BIGINT AS n
      FROM documents),
    bnd AS (
      SELECT list_extract(
               l.xs, CAST(floor(q.i * 0.1 * (l.n - 1)) AS BIGINT) + 1)
               AS b
      FROM l, range(1, {PSI_DECILES + 1}) q(i)),
    d AS (
      SELECT (SELECT count(*) FROM bnd WHERE bnd.b < doc.n_chars)
               AS bucket,
             CASE WHEN source IN ({pos}) THEN 1 ELSE 0 END AS pa
      FROM documents doc)
    SELECT bucket::BIGINT AS bucket, SUM(pa)::BIGINT AS n_a,
           SUM(1 - pa)::BIGINT AS n_b
    FROM d GROUP BY bucket
    """


# ---------------------------------------------------------------------------
# percolation_sweep — components of the thresholded occupancy lattice
# ---------------------------------------------------------------------------

PERC_RES = 5
PERC_KS = (1, 2, 3, 5)


def _perc_sweep(df: pd.DataFrame) -> pd.DataFrame:
    from oluray.functions import geo
    from oluray.pipelines.queries_wave29 import label_components

    n_grid = 1 << PERC_RES
    cnt = np.zeros((n_grid, n_grid), dtype=np.int64)
    if len(df):
        _, x, y = geo.cell_decode(df["cell"].to_numpy(np.int64))
        cnt[y, x] = df["v"].to_numpy(np.int64)
    rows = []
    for k in PERC_KS:
        mask = cnt >= k
        rows.append((k, int(mask.sum()), label_components(mask)))
    return pd.DataFrame(rows, columns=["k", "n_cells", "n_components"])


def q_percolation_sweep(sf_dir: str):
    """(k, n_cells, n_components) for occupancy thresholds k over the
    res-5 event lattice. One corpus pass; the sweep runs on the
    4^res raster."""
    from oluray.pipelines.queries_wave18 import _event_cell_counts

    counts = _event_cell_counts(sf_dir, PERC_RES)
    return counts.repartition(1).map_batches(
        _perc_sweep, batch_format="pandas", batch_size=None)


# ---------------------------------------------------------------------------
# segment_series — optimal 3-segmentation of daily event counts
# ---------------------------------------------------------------------------

SEG_K = 3


def _segment_dp(days: np.ndarray, counts: np.ndarray):
    """Exact Bellman DP: split the (day-sorted, gaps kept as
    positions) series into SEG_K contiguous segments minimizing
    total SSE. Returns list of (day_lo, day_hi, n, sum) per segment.
    Ties: earliest breakpoints win (argmin takes the first min)."""
    n = len(counts)
    c = counts.astype(np.float64)
    p1 = np.concatenate(([0.0], np.cumsum(c)))
    p2 = np.concatenate(([0.0], np.cumsum(c * c)))

    def sse(i, j):  # [i, j) vectorized over i
        ln = j - i
        s = p1[j] - p1[i]
        return (p2[j] - p2[i]) - s * s / ln

    ii = np.arange(n)
    dp = np.full((SEG_K + 1, n + 1), np.inf)
    arg = np.zeros((SEG_K + 1, n + 1), dtype=np.int64)
    dp[0, 0] = 0.0
    for k in range(1, SEG_K + 1):
        for j in range(k, n + 1):
            i = np.arange(k - 1, j)
            cost = dp[k - 1, i] + sse(i, j)
            best = int(np.argmin(cost))
            dp[k, j] = cost[best]
            arg[k, j] = i[best]
    cuts = [n]
    j = n
    for k in range(SEG_K, 0, -1):
        j = int(arg[k, j])
        cuts.append(j)
    cuts = cuts[::-1]
    segs = []
    for a, b in zip(cuts[:-1], cuts[1:]):
        segs.append((int(days[a]), int(days[b - 1]), int(b - a),
                     int(counts[a:b].sum())))
    return segs


def q_segment_series(sf_dir: str):
    """(seg, day_lo, day_hi, n_days, n_events): the optimal
    3-segment SSE partition of the daily event-count series. The
    day series is aggregate-sized (study span), so the DP runs in
    one task after a (day, count) combiner pass."""
    ev = _read(sf_dir, "events", ["ts"])

    def days(df: pd.DataFrame) -> pd.DataFrame:
        d = (df["ts"].astype("datetime64[us]").astype("int64")
             // 86_400_000_000)
        g = pd.DataFrame({"day": d,
                          "c": np.ones(len(df), dtype=np.int64)})
        return g.groupby("day", as_index=False)["c"].sum()

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("day", as_index=False)["c"].sum()
        g["day"] = g["day"].astype("int64")
        g["c"] = g["c"].astype("int64")
        return g

    agg = joins.grouped_agg(
        ev.map_batches(days, batch_format="pandas"),
        ["day"], fold, num_partitions=4, pre_repartition=False)

    def run(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("day").reset_index(drop=True)
        if len(df) < SEG_K:
            return pd.DataFrame({k: pd.array([], dtype="int64")
                                 for k in ("seg", "day_lo", "day_hi",
                                           "n_days", "n_events")})
        segs = _segment_dp(df["day"].to_numpy(np.int64),
                           df["c"].to_numpy(np.int64))
        return pd.DataFrame(
            [(i + 1, *s) for i, s in enumerate(segs)],
            columns=["seg", "day_lo", "day_hi", "n_days", "n_events"])

    return agg.repartition(1).map_batches(run, batch_format="pandas",
                                          batch_size=None)


QUERIES = {
    "psi_buckets": q_psi_buckets,
    "percolation_sweep": q_percolation_sweep,
    "segment_series": q_segment_series,
}

ORACLE = {
    "psi_buckets": _psi_sql(),
}
