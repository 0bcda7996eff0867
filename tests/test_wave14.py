"""Wave-14 checks: pyramid level consistency + oracle, marching
squares vs a dense-grid reference + oracle."""
import numpy as np
import pandas as pd

from oluray.functions import geo
from oluray.pipelines import queries_wave14 as W

SF = "/root/testdata/sf0.001"


def _oracle_df(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ("events", "orders"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    return con.sql(sql).df()


def _assert_equal(got: pd.DataFrame, exp: pd.DataFrame) -> None:
    cols = sorted(got.columns)
    gs = got[cols].sort_values(cols).reset_index(drop=True)
    es = exp[cols].sort_values(cols).reset_index(drop=True)
    assert gs.shape == es.shape
    assert (gs.astype(str).values == es.astype(str).values).all()


def test_tile_pyramid_oracle_exact():
    got = W.QUERIES["tile_pyramid"](SF).to_pandas()
    _assert_equal(got, _oracle_df(W.ORACLE["tile_pyramid"]))


def test_tile_pyramid_level_invariants():
    got = W.QUERIES["tile_pyramid"](SF).to_pandas()
    res = got["cell"] // geo.RES_SHIFT
    total = len(pd.read_parquet(f"{SF}/events.parquet",
                                columns=["event_id"]))
    # every level conserves the event total
    sums = got.groupby(res)["n_events"].sum()
    assert set(sums.index) == set(range(W.PYR_RES + 1))
    assert (sums == total).all()
    # res 0 is the single root cell
    assert (res == 0).sum() == 1
    # each level has <= 4x the cells of the one above
    per = got.groupby(res).size()
    for r in range(1, W.PYR_RES + 1):
        assert per[r] <= 4 * per[r - 1]


def test_contour_cases_oracle_exact():
    got = W.QUERIES["contour_cases"](SF).to_pandas()
    _assert_equal(got, _oracle_df(W.ORACLE["contour_cases"]))


def test_contour_cases_dense_reference():
    """Independent dense-raster marching squares on the same input."""
    got = W.QUERIES["contour_cases"](SF).to_pandas()
    ok = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey"])
    lon, lat = geo.derive_lonlat(ok["o_orderkey"].to_numpy(np.int64))
    n = 1 << W.CON_RES
    gx = np.clip(np.floor((lon + 180.0) / 360.0 * float(n)),
                 0, n - 1).astype(int)
    gy = np.clip(np.floor((lat + 90.0) / 180.0 * float(n)),
                 0, n - 1).astype(int)
    grid = np.zeros((n, n), dtype=np.int64)
    np.add.at(grid, (gy, gx), 1)
    thr = 1 + int(grid.sum()) // int((grid > 0).sum())
    hot = grid >= thr
    exp = []
    for by in range(n - 1):
        for bx in range(n - 1):
            case = (1 * hot[by, bx] + 2 * hot[by, bx + 1]
                    + 4 * hot[by + 1, bx + 1] + 8 * hot[by + 1, bx])
            if 1 <= case <= 14:
                exp.append((bx, by, case))
    act = sorted(zip(got["bx"].astype(int), got["by"].astype(int),
                     got["mcase"].astype(int)))
    assert act == sorted(exp)
    assert len(act) > 0  # threshold actually bites at sf0.001
