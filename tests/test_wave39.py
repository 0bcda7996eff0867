"""Wave-39 checks: transitivity vs oracle + bound, G-function vs
oracle + conservation, radial profile vs brute."""
import numpy as np
import pandas as pd

from oluray.pipelines import queries_wave39 as W

SF = "/root/testdata/sf0.001"


def _oracle_df(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ("events", "customer"):
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


def test_transitivity_oracle_exact():
    got = W.QUERIES["transitivity"](SF)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    assert len(got) == 1
    _assert_equal(got, _oracle_df(W.ORACLE["transitivity"]))


def test_transitivity_bound():
    got = W.QUERIES["transitivity"](SF)
    got = (got.to_pandas() if hasattr(got, "to_pandas") else got).iloc[0]
    # every closed wedge is a wedge: 0 <= C <= 1
    assert 0 <= int(got["n_tri_inc"]) <= int(got["n_wedges"])
    assert int(got["n_tri_inc"]) % 3 == 0


def test_gfunction_oracle_exact():
    got = W.QUERIES["gfunction"](SF).to_pandas()
    assert len(got) > 1
    _assert_equal(got, _oracle_df(W.ORACLE["gfunction"]))


def test_gfunction_conservation():
    import pyarrow.parquet as pq

    got = W.QUERIES["gfunction"](SF).to_pandas()
    n = pq.read_metadata(f"{SF}/customer.parquet").num_rows
    assert int(got["n_points"].sum()) == n
    max_band = int(W.G_RADIUS_M * 1000) // W.G_BAND_MM
    assert got["band"].between(-1, max_band).all()
    assert (got["n_points"] >= 0).all()


def test_radial_profile_brute():
    from oluray.functions import imagecodec
    from oluray.sources import fixtures

    got = W.QUERIES["radial_profile"](SF).to_pandas()
    assert len(got) > 0
    sample = sorted(set(got["image_id"]))[:6]
    for iid in sample:
        i = int(iid[3:])
        w = h = fixtures.SIZES[i % len(fixtures.SIZES)]
        fmt = fixtures.FMTS[i % len(fixtures.FMTS)]
        gray = imagecodec.decode(
            imagecodec.encode(fixtures._pixels(i, w, h, 42), fmt),
            fmt).astype(np.int64).sum(axis=2)
        yy, xx = np.mgrid[0:h, 0:w]
        r2 = (2 * yy - (h - 1)) ** 2 + (2 * xx - (w - 1)) ** 2
        q = max(int(r2.max()) // 4, 1)
        band = np.minimum(r2 // q, 3)
        sub = got[got["image_id"] == iid].set_index("band")
        for b in range(4):
            m = band == b
            assert int(sub.loc[b, "px_sum"]) == int(gray[m].sum())
            assert int(sub.loc[b, "n_px"]) == int(m.sum())
        assert int(sub["n_px"].sum()) == gray.size
