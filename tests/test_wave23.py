"""Wave-23 checks: basin labels vs oracle + hand basin, thinning vs
oracle + coverage invariants, colorfulness moments vs brute."""
import numpy as np
import pandas as pd

from oluray.functions import geo
from oluray.pipelines import queries_wave23 as W

SF = "/root/testdata/sf0.001"


def _oracle_df(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ("orders", "events", "documents"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    return con.sql(sql).df()


def _assert_equal(got: pd.DataFrame, exp: pd.DataFrame) -> None:
    cols = sorted(got.columns)
    assert sorted(exp.columns) == cols
    gs = got[cols].sort_values(cols).reset_index(drop=True)
    es = exp[cols].sort_values(cols).reset_index(drop=True)
    assert gs.shape == es.shape
    assert (gs.astype(str).values == es.astype(str).values).all()


def test_basins_oracle_exact():
    got = W.QUERIES["flow_basins"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["flow_basins"]))


def test_basins_hand_forest():
    """Chain 5 -> 3 -> 1 drains to the 1-sink; the isolated peak is
    its own basin; the diagonal feeder follows its lowest neighbor."""
    from oluray.pipelines.queries_wave17 import FA_RES

    base = FA_RES * geo.RES_SHIFT

    def cell(gx, gy):
        return base + gy * (1 << 29) + gx

    df = pd.DataFrame({
        "cell": [cell(2, 2), cell(3, 2), cell(4, 2), cell(9, 9),
                 cell(3, 3)],
        "n": [5, 3, 1, 7, 4]})
    got = W._fb_label(df)
    b = dict(zip(got["cell"].astype(int), got["basin"].astype(int)))
    assert b[cell(4, 2)] == cell(4, 2)       # sink
    assert b[cell(3, 2)] == cell(4, 2)
    assert b[cell(2, 2)] == cell(4, 2)
    assert b[cell(3, 3)] == cell(4, 2)       # feeder -> lowest nb
    assert b[cell(9, 9)] == cell(9, 9)       # isolated peak = sink


def test_basins_consistency_with_accumulation():
    """Every basin label is a sink (labels itself); basin cells
    partition the occupied set."""
    got = W.QUERIES["flow_basins"](SF).to_pandas()
    b = dict(zip(got["cell"].astype(int), got["basin"].astype(int)))
    sinks = {v for v in b.values()}
    for s in sinks:
        assert b[s] == s
    assert set(got["cell"].astype(int)) == set(b.keys())


def test_thin_oracle_exact():
    got = W.QUERIES["spatial_thin"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["spatial_thin"]))


def test_thin_coverage():
    """Thinned set: one row per occupied cell; the kept event really
    falls in its cell; ids are events."""
    import pyarrow.parquet as pq

    got = W.QUERIES["spatial_thin"](SF).to_pandas()
    assert got["cell"].is_unique
    ids = pq.read_table(f"{SF}/events.parquet",
                        columns=["event_id"])["event_id"].to_numpy()
    assert set(got["event_id"].astype(int)) <= set(ids.tolist())
    lon, lat = geo.derive_lonlat(got["event_id"].to_numpy(np.int64))
    assert (geo.cell_encode(lon, lat, W.THIN_RES)
            == got["cell"].to_numpy(np.int64)).all()


def test_colorfulness_brute():
    from oluray.functions import imagecodec
    from oluray.sources import fixtures

    got = W.QUERIES["image_colorfulness"](SF).to_pandas()
    assert len(got) > 0
    for r in got.sort_values("image_id").head(10).itertuples():
        i = int(r.image_id[3:])
        w = h = fixtures.SIZES[i % len(fixtures.SIZES)]
        fmt = fixtures.FMTS[i % len(fixtures.FMTS)]
        px = imagecodec.decode(
            imagecodec.encode(fixtures._pixels(i, w, h, 42), fmt),
            fmt).astype(np.int64)
        rg = px[:, :, 0] - px[:, :, 1]
        yb2 = px[:, :, 0] + px[:, :, 1] - 2 * px[:, :, 2]
        assert int(r.n_px) == rg.size
        assert int(r.sum_rg) == int(rg.sum())
        assert int(r.sum_rg2) == int((rg * rg).sum())
        assert int(r.sum_yb2) == int(yb2.sum())
        assert int(r.sum_yb22) == int((yb2 * yb2).sum())
        # variance non-negativity (moments are consistent)
        n = rg.size
        assert n * int(r.sum_rg2) - int(r.sum_rg) ** 2 >= 0
        assert n * int(r.sum_yb22) - int(r.sum_yb2) ** 2 >= 0
