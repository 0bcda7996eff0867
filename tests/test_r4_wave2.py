"""Brute-force checks for the r4 wave-2 catalog additions that the
DuckDB oracle can't see: bipartite k-core (iterated peel is not a
monotone recursive CTE) and the image x tile dominant-color rollup
(pixel decode is not SQL). The oracle-backed trio of the same wave
(bloom_join / morans_i / cell_stays) is covered by the driver gate."""
import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from oluray.functions import geo, imagecodec
from oluray.pipelines import queries as Q
from oluray.sources import fixtures

SF = "/root/testdata/sf0.001"


def _brute_kcore(k: int) -> pd.DataFrame:
    e = duckdb.sql(
        f"SELECT DISTINCT l_suppkey s, l_partkey p "
        f"FROM '{SF}/lineitem.parquet'"
    ).df()
    cur = e
    while True:
        sd = cur.groupby("s").size()
        pdg = cur.groupby("p").size()
        bad_s = set(sd[sd < k].index)
        bad_p = set(pdg[pdg < k].index)
        if not bad_s and not bad_p:
            break
        cur = cur[~cur.s.isin(bad_s) & ~cur.p.isin(bad_p)]
        if len(cur) == 0:
            break
    if len(cur) == 0:
        return pd.DataFrame({"side": pd.array([], dtype="str"),
                             "node": pd.array([], dtype="int64"),
                             "deg": pd.array([], dtype="int64")})
    sd = cur.groupby("s").size()
    pdg = cur.groupby("p").size()
    return pd.concat([
        pd.DataFrame({"side": "supp", "node": sd.index, "deg": sd.values}),
        pd.DataFrame({"side": "part", "node": pdg.index, "deg": pdg.values}),
    ])


def test_kcore_matches_sequential_peel():
    got = (Q.q_kcore(SF).to_pandas()
           .sort_values(["side", "node"]).reset_index(drop=True)
           .astype({"node": "int64", "deg": "int64"}))
    exp = (_brute_kcore(Q.KCORE_K)
           .sort_values(["side", "node"]).reset_index(drop=True)
           .astype({"node": "int64", "deg": "int64"}))
    assert got.equals(exp)
    # non-degenerate at this sf: the peel removed something AND a
    # proper core survived (otherwise the test proves nothing)
    full = _brute_kcore(1)
    assert 0 < len(exp) < len(full)


def test_tile_color_matches_pure_python():
    ids = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id"])["doc_id"].to_pylist()
    rows = []
    for i in ids:
        w = h = fixtures.SIZES[int(i) % len(fixtures.SIZES)]
        fmt = fixtures.FMTS[int(i) % len(fixtures.FMTS)]
        blob = imagecodec.encode(fixtures._pixels(int(i), w, h, 42), fmt)
        px = imagecodec.decode(blob, fmt)
        sums = px.reshape(-1, px.shape[-1]).sum(axis=0, dtype=np.uint64)
        lon, lat = geo.derive_lonlat(np.array([int(i)], dtype=np.int64))
        tile = int(geo.cell_encode(lon, lat, Q.TILE_COLOR_RES)[0])
        rows.append({"tile": tile, "dom": int(np.argmax(sums))})
    df = pd.DataFrame(rows)
    g = (df.groupby(["tile", "dom"], as_index=False).size()
         .rename(columns={"size": "n"}))
    tot = g.groupby("tile", as_index=False)["n"].sum().rename(
        columns={"n": "n_images"})
    g = g.sort_values(["tile", "n", "dom"],
                      ascending=[True, False, True], kind="mergesort")
    w = g.drop_duplicates("tile", keep="first").rename(
        columns={"dom": "dom_channel", "n": "n_dom"})
    exp = (w.merge(tot, on="tile")[
        ["tile", "dom_channel", "n_dom", "n_images"]]
        .sort_values("tile").reset_index(drop=True).astype("int64"))
    got = (Q.q_tile_color(SF).to_pandas()
           .sort_values("tile").reset_index(drop=True).astype("int64"))
    assert got.equals(exp)
    # the rollup is real at this resolution: at least one tile holds
    # several images
    assert int(exp["n_images"].max()) >= 3
