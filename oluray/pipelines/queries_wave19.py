"""Wave-19 catalog: per-group Gini coefficient, per-image exact Otsu
thresholding, and raster viewshed line-of-sight.

`gini_spend` is the inequality statistic (economics / spend-skew
dashboards) as an exact rational per nation: with per-customer spend
x_1 <= ... <= x_n (cents), G = gnum/gden where
gnum = 2*sum(i*x_i) - (n+1)*sum(x) and gden = n*sum(x). Ties don't
affect sum(i*x_i) (equal values commute), so row_number order is
immaterial and the SQL twin hash-matches bit-exactly. One corpus
pass builds the per-customer aggregate; the rank-weighted fold runs
per nation partition on the aggregate-sized spend table with
Python-int accumulation (the split-word discipline
`q_group_linreg` documents — no silent int64 wrap at scale).

`otsu_threshold` is the classic global binarization: per image,
the threshold maximizing between-class variance over the 766-bin
gray (channel-sum) histogram. sigma_B^2(t) = (S*W0 - W*S0)^2 /
(W0*(W-W0)) is compared across t by exact integer
cross-multiplication (num^2 overflows int64 at 64x64, so the
766-candidate scan uses Python ints). Decode-local actor stage;
rows-only (pixel decode is not SQL), brute-verified in pytest.

`viewshed` is the terrain line-of-sight operator (R3 algorithm) on
the order-count raster: a target cell is visible from the
max-elevation observer iff no sampled intermediate cell's elevation
reaches the sight line — the grazing-blocks comparison
(e_k - h)*K >= (e_t - h)*k is exact integer cross-multiplication.
Intermediate cells sampled per major-axis step with deterministic
round-half-up minor coordinates, all integer. The raster is
aggregate-sized (4^res), so the sweep runs in one vectorized task
(same size-probed shape as `flow_accum`); rows-only + hand-built
terrain pytest.
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from oluray.functions import geo
from oluray.stages import joins


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# gini_spend — exact Gini coefficient of customer spend per nation
# ---------------------------------------------------------------------------


def q_gini_spend(sf_dir: str):
    """Per-nation Gini of customer order spend (cents): emits the
    exact rational (gnum, gden) with G = gnum/gden in [0, 1).
    Customers with no orders are excluded (inner-join semantics,
    matching the SQL twin). Corpus passes once through the
    per-customer cents combiner; ranking happens per nation on the
    aggregate-sized (customer, spend) table."""
    from oluray.pipelines.queries import _round_half_away

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "c_custkey": df["o_custkey"],
            "spend": _round_half_away(
                df["o_totalprice"].to_numpy(np.float64) * 100.0)})
        return g.groupby("c_custkey", as_index=False)["spend"].sum()

    def fold_cust(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("c_custkey", as_index=False)["spend"].sum()
        g["spend"] = g["spend"].astype("int64")
        return g

    spend = joins.grouped_agg(
        orders.map_batches(cents, batch_format="pandas"),
        ["c_custkey"], fold_cust, num_partitions=8,
        pre_repartition=False)
    j = joins.hash_join(spend, cust, "c_custkey", num_partitions=8)

    def gini(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for nk, sub in df.groupby("c_nationkey", sort=False):
            # Python-int accumulation: i*x_i products overflow int64
            # once n*spend_cents nears 2^63 (real at warehouse scale)
            vals = np.sort(sub["spend"].to_numpy(np.int64))
            n = len(vals)
            sx = int(vals.sum(dtype=object))
            six = int((np.arange(1, n + 1, dtype=object)
                       * vals.astype(object)).sum())
            rows.append((int(nk), n, 2 * six - (n + 1) * sx, n * sx))
        return pd.DataFrame(rows, columns=["nationkey", "n_cust",
                                           "gnum", "gden"])

    return joins.grouped_agg(j, ["c_nationkey"], gini,
                             num_partitions=8, pre_repartition=False)


_GINI_SQL = """
    WITH oc AS (
      SELECT o_custkey AS ck,
             round(o_totalprice * 100.0, 0)::BIGINT AS cents
      FROM orders),
    sp AS (SELECT ck, SUM(cents)::BIGINT AS spend FROM oc GROUP BY ck),
    j AS (SELECT c_nationkey AS nk, spend
          FROM sp JOIN customer ON ck = c_custkey),
    r AS (SELECT nk, spend,
                 row_number() OVER (PARTITION BY nk ORDER BY spend)
                   AS i
          FROM j)
    SELECT nk AS nationkey, count(*)::BIGINT AS n_cust,
           (2 * SUM(i::HUGEINT * spend)
            - (count(*) + 1)::HUGEINT * SUM(spend))::BIGINT AS gnum,
           (count(*)::HUGEINT * SUM(spend))::BIGINT AS gden
    FROM r GROUP BY nk
"""


# ---------------------------------------------------------------------------
# otsu_threshold — exact per-image Otsu binarization
# ---------------------------------------------------------------------------


class OtsuStage:
    """Actor-pool stage: decode once per image, build the 766-bin
    gray histogram, pick the between-class-variance argmax by exact
    integer cross-multiplication (smallest t wins ties)."""

    def __init__(self):
        from oluray.functions import imagecodec

        self.decode = imagecodec.decode

    @staticmethod
    def _otsu(hist: np.ndarray) -> int:
        w0 = np.cumsum(hist)
        s0 = np.cumsum(np.arange(len(hist), dtype=np.int64) * hist)
        w = int(w0[-1])
        s = int(s0[-1])
        best_t, best_num2, best_den = -1, 0, 1
        for t in range(len(hist) - 1):
            wt, st = int(w0[t]), int(s0[t])
            den = wt * (w - wt)
            if den == 0:
                continue
            num = s * wt - w * st
            num2 = num * num  # Python int: exceeds int64 at 64x64
            if best_t < 0 or num2 * best_den > best_num2 * den:
                best_t, best_num2, best_den = t, num2, den
        return best_t

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("image_id", "otsu_t", "fg_px", "bg_px")}
        for iid, blob, fmt in zip(batch["image_id"].to_pylist(),
                                  batch["bytes"].to_pylist(),
                                  batch["fmt"].to_pylist()):
            gray = self.decode(blob, fmt).astype(np.int64).sum(axis=2)
            hist = np.bincount(gray.ravel(), minlength=766)[:766]
            t = self._otsu(hist.astype(np.int64))
            fg = int((gray > t).sum())
            out["image_id"].append(iid)
            out["otsu_t"].append(t)
            out["fg_px"].append(fg)
            out["bg_px"].append(int(gray.size - fg))
        return pa.table({"image_id": pa.array(out["image_id"]),
                         "otsu_t": pa.array(out["otsu_t"], pa.int64()),
                         "fg_px": pa.array(out["fg_px"], pa.int64()),
                         "bg_px": pa.array(out["bg_px"], pa.int64())})


def q_otsu_threshold(sf_dir: str):
    """Exact Otsu threshold + foreground count per synthetic image.
    Decode-local; one tiny row per image leaves the task. Rows-only;
    brute-verified in pytest against an independent argmax."""
    from oluray.pipelines.queries import _synth_images

    images = _synth_images(sf_dir)
    return images.map_batches(OtsuStage, batch_format="pyarrow",
                              batch_size=256, concurrency=(1, 4))


# ---------------------------------------------------------------------------
# viewshed — line-of-sight visibility on the order-count raster
# ---------------------------------------------------------------------------

VS_RES = 4  # 16 x 16


def _vs_visibility(df: pd.DataFrame) -> pd.DataFrame:
    """Single-task R3 viewshed over the aggregate raster: df has
    (cell, n) occupied rows; empty cells are elevation 0. Observer =
    max elevation (tie: smallest cell id). Exact integers end to
    end."""
    n_grid = 1 << VS_RES
    elev = np.zeros((n_grid, n_grid), dtype=np.int64)
    if len(df):
        _, x, y = geo.cell_decode(df["cell"].to_numpy(np.int64))
        elev[y, x] = df["n"].to_numpy(np.int64)
    # observer: max elevation, tie -> smaller cell id (y, then x)
    flat = elev.ravel()  # index = y * n_grid + x, ascending cell id
    obs_i = int(np.argmax(flat))  # argmax takes the FIRST maximum
    oy, ox = divmod(obs_i, n_grid)
    h = int(elev[oy, ox])

    cells, elevs, vis = [], [], []
    base = np.int64(VS_RES) * np.int64(geo.RES_SHIFT)
    for ty in range(n_grid):
        for tx in range(n_grid):
            et = int(elev[ty, tx])
            dx, dy = tx - ox, ty - oy
            k_max = max(abs(dx), abs(dy))
            visible = 1
            if k_max > 1:
                k = np.arange(1, k_max)
                if abs(dx) >= abs(dy):
                    sx = 1 if dx > 0 else -1
                    xs = ox + sx * k
                    # minor coord: round-half-up of oy + dy*k/K
                    ys = (2 * oy * k_max + 2 * dy * sx * (xs - ox)
                          + k_max) // (2 * k_max)
                else:
                    sy = 1 if dy > 0 else -1
                    ys = oy + sy * k
                    xs = (2 * ox * k_max + 2 * dx * sy * (ys - oy)
                          + k_max) // (2 * k_max)
                ek = elev[ys, xs].astype(np.int64)
                # grazing blocks: (e_k - h) * K >= (e_t - h) * k
                blocked = ((ek - h) * np.int64(k_max)
                           >= np.int64(et - h) * k)
                if bool(blocked.any()):
                    visible = 0
            cells.append(int(base + np.int64(ty) * np.int64(geo.Y_SHIFT)
                             + np.int64(tx)))
            elevs.append(et)
            vis.append(visible)
    return pd.DataFrame({"cell": pd.array(cells, dtype="int64"),
                         "elev": pd.array(elevs, dtype="int64"),
                         "visible": pd.array(vis, dtype="int64")})


def q_viewshed(sf_dir: str):
    """Viewshed from the busiest cell over the order-count 'terrain':
    (cell, elev, visible) for every grid cell. The corpus passes once
    through the cell-count combiner; the LOS sweep runs on the
    4^res-bounded raster in one task (beyond that the per-ray checks
    shard by target block, same message shape as `flow_accum`)."""
    orders = _read(sf_dir, "orders", ["o_orderkey"])

    def cells(t: pa.Table) -> pa.Table:
        okey = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        lon, lat = geo.derive_lonlat(okey)
        c = geo.cell_encode(lon, lat, VS_RES)
        u, cnt = np.unique(c, return_counts=True)
        return pa.table({"cell": pa.array(u),
                         "n": pa.array(cnt.astype(np.int64))})

    def csum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("cell", as_index=False)["n"].sum()

    counts = joins.grouped_agg(
        orders.map_batches(cells, batch_format="pyarrow"),
        ["cell"], csum, num_partitions=8, pre_repartition=False)
    return counts.repartition(1).map_batches(
        _vs_visibility, batch_format="pandas", batch_size=None)


QUERIES = {
    "gini_spend": q_gini_spend,
    "otsu_threshold": q_otsu_threshold,
    "viewshed": q_viewshed,
}

ORACLE = {
    "gini_spend": _GINI_SQL,
}
