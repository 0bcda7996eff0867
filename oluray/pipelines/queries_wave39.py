"""Wave-39 catalog: global transitivity, the nearest-neighbor
G-function, and per-image radial intensity profiles.

`transitivity` is the global clustering ratio C = 3*triangles /
wedges — emitted as the exact integer pair (n_wedges, n_tri_inc)
with n_wedges = sum(deg*(deg-1)/2) and n_tri_inc = 3 * triangle
count (the per-node triangle counter summed); the division is the
caller's. Composes the degree and triangle machinery; one-row
output.

`gfunction` is the point-pattern G-function (spatstat's first
diagnostic): the count of points whose nearest-neighbor distance
falls in each 30 km band (plus a censored row, band = -1, for
points with no neighbor within the 150 km search radius). Per-point
NN distances come from the bucketed `distance_self_join` (pairs
within the radius, min per endpoint) — never all-pairs; the
censored count is total minus matched. Banding uses the rounded
millimeter distance, bit-equal to the SQL twin.

`radial_profile` is the per-image radial energy profile (lens
vignetting / frequency-falloff screen): exact integer gray sums and
pixel counts per squared-radius band around the image center
(r2 // (R2_max // 4) quarters). Decode-local; rows-only,
brute-verified.
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from oluray.functions import geo
from oluray.stages import joins, spatial

G_RADIUS_M = 150_000.0
G_BAND_MM = 30_000_000  # 30 km bands on the mm-rounded NN distance


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# transitivity — exact (n_wedges, n_tri_inc) of the interaction graph
# ---------------------------------------------------------------------------


def q_transitivity(sf_dir: str):
    """One row (n_wedges, n_tri_inc): global transitivity numerator
    and denominator; C = n_tri_inc / n_wedges."""
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
        return pd.DataFrame({"node": np.concatenate(
            [df["lo"].to_numpy(np.int64), df["hi"].to_numpy(np.int64)])})

    def dcount(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False).size().rename(
            columns={"size": "deg"})
        g["deg"] = g["deg"].astype("int64")
        return g

    deg = joins.grouped_agg(
        ce.map_batches(endpoints, batch_format="pandas"),
        ["node"], dcount, num_partitions=8, pre_repartition=False)

    def wedge_part(df: pd.DataFrame) -> pd.DataFrame:
        d = df["deg"].to_numpy(np.int64).astype(object)
        return pd.DataFrame({"w": [int((d * (d - 1) // 2).sum())]})

    n_wedges = sum(int(b["w"].sum()) for b in deg.map_batches(
        wedge_part, batch_format="pandas").iter_batches(
        batch_format="pandas", batch_size=1024))

    tri = _triangle_counts(e)
    n_tri_inc = sum(int(b["n_tri"].sum()) for b in tri.iter_batches(
        batch_format="pandas", batch_size=65536))
    return pd.DataFrame([{"n_wedges": n_wedges,
                          "n_tri_inc": n_tri_inc}])


def _transitivity_sql() -> str:
    from oluray.pipelines.queries_wave22 import _EDGES_CTE

    return f"""
    WITH {_EDGES_CTE},
    canon AS (SELECT DISTINCT LEAST(a, b) AS lo, GREATEST(a, b) AS hi
              FROM edges),
    deg AS (SELECT node, count(*)::HUGEINT AS deg FROM (
              SELECT lo AS node FROM canon
              UNION ALL SELECT hi FROM canon) GROUP BY node),
    tri AS (SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
            FROM canon e1
            JOIN canon e2 ON e2.lo = e1.hi
            JOIN canon e3 ON e3.lo = e1.lo AND e3.hi = e2.hi)
    SELECT (SELECT SUM(deg * (deg - 1) // 2) FROM deg)::BIGINT
             AS n_wedges,
           (3 * (SELECT count(*) FROM tri))::BIGINT AS n_tri_inc
    """


# ---------------------------------------------------------------------------
# gfunction — NN-distance band counts with censoring
# ---------------------------------------------------------------------------


def q_gfunction(sf_dir: str):
    """(band, n_points): band = nn_dist_mm // 30km-in-mm for customer
    points whose nearest neighbor lies within 150 km; band -1 counts
    the censored rest."""
    from oluray.pipelines.queries import _with_points

    cust = _read(sf_dir, "customer", ["c_custkey"])
    pts = _with_points(cust, "c_custkey").materialize()
    n_total = int(pts.count())
    pairs = spatial.distance_self_join(pts, "c_custkey", G_RADIUS_M,
                                       num_partitions=32)

    def both(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": np.concatenate([df["ka"].to_numpy(np.int64),
                                 df["kb"].to_numpy(np.int64)]),
            "d": np.concatenate([df["dist_mm"].to_numpy(np.int64)] * 2)})

    def nn_min(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("k", as_index=False)["d"].min()
        g["d"] = g["d"].astype("int64")
        return g

    nn = joins.grouped_agg(
        pairs.map_batches(both, batch_format="pandas"),
        ["k"], nn_min, num_partitions=8, pre_repartition=False)

    def band_fold(df: pd.DataFrame) -> pd.DataFrame:
        band = df["d"].to_numpy(np.int64) // G_BAND_MM
        g = pd.DataFrame({"band": band, "n_points": 1})
        return g.groupby("band", as_index=False)["n_points"].sum()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("band", as_index=False)["n_points"].sum()
        g["band"] = g["band"].astype("int64")
        g["n_points"] = g["n_points"].astype("int64")
        matched = int(g["n_points"].sum())
        cens = pd.DataFrame([{"band": -1,
                              "n_points": n_total - matched}])
        return pd.concat([g, cens], ignore_index=True)

    return joins.grouped_agg(
        nn.map_batches(band_fold, batch_format="pandas"),
        ["band"], lambda d: d.groupby("band", as_index=False)[
            "n_points"].sum(), num_partitions=4,
        pre_repartition=False).repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def _gfunction_sql() -> str:
    lon, lat = geo.derive_lonlat_sql("c_custkey")
    hav = geo.haversine_sql("a.lon", "a.lat", "b.lon", "b.lat")
    return f"""
    WITH p AS (SELECT c_custkey AS k, {lon} AS lon, {lat} AS lat
               FROM customer),
    pr AS (
      SELECT a.k AS k, round({hav} * 1000.0)::BIGINT AS dist_mm
      FROM p a JOIN p b ON a.k <> b.k
      WHERE {hav} < {G_RADIUS_M!r}),
    nn AS (SELECT k, min(dist_mm) AS d FROM pr GROUP BY k),
    bands AS (
      SELECT (d // {G_BAND_MM})::BIGINT AS band,
             count(*)::BIGINT AS n_points
      FROM nn GROUP BY 1)
    SELECT band, n_points FROM bands
    UNION ALL
    SELECT -1,
           ((SELECT count(*) FROM p) - (SELECT count(*) FROM nn))
             ::BIGINT
    """


# ---------------------------------------------------------------------------
# radial_profile — exact gray sums per squared-radius quarter
# ---------------------------------------------------------------------------


class RadialProfile:
    """Actor-pool stage: decode once, bucket pixels by squared
    distance from the image center (integer 2x coordinates avoid
    half-pixel floats), emit exact per-band sums."""

    def __init__(self):
        from oluray.functions import imagecodec

        self.decode = imagecodec.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("image_id", "band", "px_sum", "n_px")}
        for iid, blob, fmt in zip(batch["image_id"].to_pylist(),
                                  batch["bytes"].to_pylist(),
                                  batch["fmt"].to_pylist()):
            gray = self.decode(blob, fmt).astype(np.int64).sum(axis=2)
            h, w = gray.shape
            yy, xx = np.mgrid[0:h, 0:w]
            # doubled coords: center = (h-1, w-1) in 2x units
            r2 = (2 * yy - (h - 1)) ** 2 + (2 * xx - (w - 1)) ** 2
            r2max = int(r2.max())
            q = max(r2max // 4, 1)
            band = np.minimum(r2 // q, 3)
            for b in range(4):
                m = band == b
                out["image_id"].append(iid)
                out["band"].append(b)
                out["px_sum"].append(int(gray[m].sum()))
                out["n_px"].append(int(m.sum()))
        return pa.table({
            "image_id": pa.array(out["image_id"]),
            "band": pa.array(out["band"], pa.int64()),
            "px_sum": pa.array(out["px_sum"], pa.int64()),
            "n_px": pa.array(out["n_px"], pa.int64())})


def q_radial_profile(sf_dir: str):
    """Per-image radial bands (4 squared-radius quarters): exact
    (px_sum, n_px) each. Rows-only; brute-verified in pytest."""
    from oluray.pipelines.queries import _synth_images

    images = _synth_images(sf_dir)
    return images.map_batches(RadialProfile, batch_format="pyarrow",
                              batch_size=256, concurrency=(1, 4))


QUERIES = {
    "transitivity": q_transitivity,
    "gfunction": q_gfunction,
    "radial_profile": q_radial_profile,
}

ORACLE = {
    "transitivity": _transitivity_sql(),
    "gfunction": _gfunction_sql(),
}
