"""Wave-15 checks: exact supercover vs oracle + geometric
invariants (supercover is a superset of the sampled rasterization;
cells form a connected path per segment), bilinear readback vs
oracle + analytic spot checks."""
import numpy as np
import pandas as pd

from oluray.functions import geo
from oluray.pipelines import queries_wave13 as W13
from oluray.pipelines import queries_wave15 as W

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
    assert (gs.astype("int64").values == es.astype("int64").values).all()


def test_supercover_oracle_exact():
    got = W.QUERIES["supercover_cells"](SF).to_pandas()
    _assert_equal(got, _oracle_df(W.ORACLE["supercover_cells"]))


def test_supercover_superset_of_sampled():
    # every (user, cell) the 64-point sampling finds must be in the
    # exact supercover (same res on both: wave-13 uses res 6 too)
    assert W13.TC_RES == W.SC_RES
    sc = W.QUERIES["supercover_cells"](SF).to_pandas()
    tc = W13.QUERIES["track_cells"](SF).to_pandas()
    sset = set(zip(sc["user_id"], sc["cell"]))
    tset = set(zip(tc["user_id"], tc["cell"]))
    assert tset <= sset
    # and the exact cover is strictly tighter than a full-grid blowup
    assert len(sc) >= len(tc)


def test_supercover_single_segment_path():
    """Brute-force a single segment: dense 0..1 sampling at 1e5
    points finds exactly the supercover's cells."""
    from oluray.pipelines.queries_wave15 import SC_N, SC_RES

    rng = np.random.default_rng(7)
    for _ in range(20):
        x0, x1 = rng.uniform(-170, 170, 2)
        y0, y1 = rng.uniform(-80, 80, 2)
        t = np.linspace(0, 1, 100_000)
        px = x0 + (x1 - x0) * t
        py = y0 + (y1 - y0) * t
        gx = np.clip(np.floor((px + 180.0) / 360.0 * SC_N), 0,
                     SC_N - 1).astype(np.int64)
        gy = np.clip(np.floor((py + 90.0) / 180.0 * SC_N), 0,
                     SC_N - 1).astype(np.int64)
        dense = set(zip(gx.tolist(), gy.tolist()))

        # replicate the engine's crossing enumeration inline
        def kidx(v, lo, span):
            return int(np.floor((v - lo) / span * float(SC_N)))

        ts = [0.0, 1.0]
        for (a0, a1, lo, span) in ((x0, x1, -180.0, 360.0),
                                   (y0, y1, -90.0, 180.0)):
            k0, k1 = kidx(a0, lo, span), kidx(a1, lo, span)
            for k in range(min(k0, k1) + 1, max(k0, k1) + 1):
                ak = lo + k * (span / SC_N)
                ts.append((ak - a0) / (a1 - a0))
        ts.sort()
        cover = set()
        for ta, tb in zip(ts[:-1], ts[1:]):
            tm = (ta + tb) * 0.5
            sx = x0 + (x1 - x0) * tm
            sy = y0 + (y1 - y0) * tm
            cx = min(max(int(np.floor((sx + 180.0) / 360.0 * SC_N)), 0),
                     SC_N - 1)
            cy = min(max(int(np.floor((sy + 90.0) / 180.0 * SC_N)), 0),
                     SC_N - 1)
            cover.add((cx, cy))
        assert dense <= cover
        # supercover adds at most corner-touch cells beyond the dense set
        assert len(cover) <= len(dense) + 4


def test_bilinear_oracle_exact():
    got = W.QUERIES["bilinear_sample"](SF).to_pandas()
    _assert_equal(got, _oracle_df(W.ORACLE["bilinear_sample"]))


def test_bilinear_bounds_and_interior():
    got = W.QUERIES["bilinear_sample"](SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id"])
    assert len(got) == len(ev)
    assert (got["bl_num"] >= 0).all()
    # interpolated value never exceeds the max cell count
    ok = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey"])
    lon, lat = geo.derive_lonlat(ok["o_orderkey"].to_numpy(np.int64))
    c = geo.cell_encode(lon, lat, W.SC_RES)
    vmax = int(pd.Series(c).value_counts().max())
    den = W.BL_FP * W.BL_FP
    assert (got["bl_num"] <= vmax * den).all()
