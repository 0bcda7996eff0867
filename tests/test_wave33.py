"""Wave-33 checks: coverage vs oracle + alpha invariants, ellipse
moments vs oracle + PSD covariance."""
import numpy as np
import pandas as pd

from oluray.pipelines import queries_wave33 as W

SF = "/root/testdata/sf0.001"


def _oracle_df(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')")
    return con.sql(sql).df()


def _assert_equal(got: pd.DataFrame, exp: pd.DataFrame) -> None:
    cols = sorted(got.columns)
    assert sorted(exp.columns) == cols
    gs = got[cols].sort_values(cols).reset_index(drop=True)
    es = exp[cols].sort_values(cols).reset_index(drop=True)
    assert gs.shape == es.shape
    assert (gs.astype(str).values == es.astype(str).values).all()


def test_coverage_oracle_exact():
    got = W.QUERIES["cell_coverage"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["cell_coverage"]))


def test_polys_in_sync():
    """Wave-33's local PIP_POLYS copy must stay identical to the
    canonical definition in queries.py."""
    from oluray.pipelines import queries as Q

    assert W.PIP_POLYS == Q.PIP_POLYS


def test_coverage_invariants():
    """Alpha in 1..16; every polygon contributes; interior cells
    (16/16) exist for every polygon; partial boundary cells exist."""
    got = W.QUERIES["cell_coverage"](SF).to_pandas()
    assert got["n_sub16"].between(1, 16).all()
    for pid in W.PIP_POLYS:
        sub = got[got["poly_id"] == pid]
        assert len(sub) > 0
        assert (sub["n_sub16"] == 16).any()      # interior
        assert (sub["n_sub16"] < 16).any()       # boundary
    assert (got["n_events"] >= 0).all()
    # no duplicate (poly, cell)
    assert not got.duplicated(["poly_id", "cell"]).any()


def test_coverage_kernel_square():
    """Hand polygon: an axis-aligned square covering exactly 2x2
    res-7 cells has four 16/16 cells; a half-cell-wide sliver gets
    partial alpha."""
    dx, dy = W._DX, W._DY
    # square aligned to cell edges [x0, x0+2cells) x [y0, y0+2cells)
    x0, y0 = 10, 20
    lonl, latl = -180.0 + x0 * dx, -90.0 + y0 * dy
    ring_x = [lonl, lonl + 2 * dx, lonl + 2 * dx, lonl]
    ring_y = [latl, latl, latl + 2 * dy, latl + 2 * dy]
    rows = W._coverage_rows(99, ring_x, ring_y)
    full = rows[rows["n_sub16"] == 16]
    assert len(full) == 4
    # half-width sliver: one column of cells at alpha 8
    ring_x2 = [lonl, lonl + 0.5 * dx, lonl + 0.5 * dx, lonl]
    rows2 = W._coverage_rows(98, ring_x2, ring_y)
    assert (rows2["n_sub16"] == 8).sum() == 2


def test_ellipse_oracle_exact():
    got = W.QUERIES["spatial_ellipse"](SF).to_pandas()
    assert len(got) == 5
    _assert_equal(got, _oracle_df(W.ORACLE["spatial_ellipse"]))


def test_ellipse_psd():
    """n*sxx - sx^2 >= 0, n*syy - sy^2 >= 0, and the covariance
    matrix determinant is non-negative (Cauchy-Schwarz)."""
    got = W.QUERIES["spatial_ellipse"](SF).to_pandas()
    for r in got.itertuples():
        n, sx, sy = int(r.n), int(r.sx), int(r.sy)
        sxx, syy, sxy = int(r.sxx), int(r.syy), int(r.sxy)
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        cxy = n * sxy - sx * sy
        assert vx >= 0 and vy >= 0
        assert vx * vy - cxy * cxy >= 0
