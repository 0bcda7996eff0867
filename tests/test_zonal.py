"""Zonal statistics: the oracle-backed event-value rollup is
spot-checked here at sf0.001 (the driver gate re-checks at sf0.01);
the pixel variant (not SQL-expressible) is brute-verified against a
pure-Python decode + point-in-polygon re-derivation."""
import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from oluray.functions import geo, imagecodec
from oluray.pipelines import queries as Q
from oluray.sources import fixtures

SF = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return (df.sort_values(list(df.columns), kind="mergesort")
            .reset_index(drop=True).astype(str))


def test_zonal_stats_matches_oracle():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    exp = con.execute(Q.ORACLE["zonal_stats"]).df()
    got = Q.q_zonal_stats(SF).to_pandas()
    assert _norm(got).equals(_norm(exp))
    assert len(got) > 0


def _pip(rx, ry, lon, lat) -> bool:
    inside = False
    n = len(rx)
    for i in range(n):
        x1, y1 = rx[i], ry[i]
        x2, y2 = rx[(i + 1) % n], ry[(i + 1) % n]
        if (y1 > lat) != (y2 > lat):
            xint = (x2 - x1) * (lat - y1) / (y2 - y1) + x1
            if lon < xint:
                inside = not inside
    return inside


def test_zonal_pixel_stats_matches_brute():
    ids = [int(i) for i in pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id"])["doc_id"].to_pylist()]
    rows = []
    for i in ids:
        w = h = fixtures.SIZES[i % len(fixtures.SIZES)]
        fmt = fixtures.FMTS[i % len(fixtures.FMTS)]
        px = imagecodec.decode(
            imagecodec.encode(fixtures._pixels(i, w, h, 42), fmt), fmt)
        s = px.reshape(-1, 3).sum(axis=0, dtype=np.uint64)
        lon, lat = geo.derive_lonlat(np.array([i], dtype=np.int64))
        for pid, (rx, ry) in Q.PIP_POLYS.items():
            if _pip(rx, ry, float(lon[0]), float(lat[0])):
                rows.append({"poly_id": pid, "sum_r": int(s[0]),
                             "sum_g": int(s[1]), "sum_b": int(s[2]),
                             "n_px": w * h})
    b = pd.DataFrame(rows)
    exp = (b.groupby("poly_id", as_index=False)
           .agg(n_images=("n_px", "size"), sum_r=("sum_r", "sum"),
                sum_g=("sum_g", "sum"), sum_b=("sum_b", "sum"),
                n_px=("n_px", "sum")).astype("int64"))
    got = (Q.q_zonal_pixel_stats(SF).to_pandas()
           .sort_values("poly_id").reset_index(drop=True).astype("int64"))
    assert got.equals(exp.sort_values("poly_id").reset_index(drop=True))
    assert 0 < len(got) <= len(Q.PIP_POLYS)
