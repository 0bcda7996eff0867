"""Wave-19 checks: Gini vs oracle + brute mean-absolute-difference
identity, Otsu vs an independent float argmax + histogram identity,
viewshed vs an independent per-ray walker + hand-built terrain."""
import numpy as np
import pandas as pd

from oluray.functions import geo
from oluray.pipelines import queries_wave19 as W

SF = "/root/testdata/sf0.001"


def _oracle_df(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ("orders", "customer", "documents"):
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


def test_gini_oracle_exact():
    got = W.QUERIES["gini_spend"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["gini_spend"]))


def test_gini_brute_mad_identity():
    """G also equals mean absolute difference / (2*mean): check
    gnum/gden == sum_ij |x_i - x_j| / (2*n*sum(x)) on one nation."""
    import duckdb

    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    sp = con.sql("""
        SELECT c_nationkey AS nk, SUM(round(o_totalprice*100.0, 0))
                 ::BIGINT AS spend
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey, o_custkey""").df()
    got = W.QUERIES["gini_spend"](SF).to_pandas().set_index("nationkey")
    nk = int(sp["nk"].iloc[0])
    x = sp.loc[sp["nk"] == nk, "spend"].to_numpy(np.int64)
    mad = int(np.abs(x[:, None] - x[None, :]).sum())
    row = got.loc[nk]
    # gnum/gden == mad / (2*n*sum) -> cross-multiplied exact check
    assert int(row["gnum"]) * 2 * len(x) * int(x.sum()) == \
        mad * int(row["gden"])
    assert 0 <= int(row["gnum"]) < int(row["gden"])


def test_otsu_brute():
    """Engine threshold equals an independent exact scan, and fg/bg
    counts partition the image."""
    from oluray.functions import imagecodec
    from oluray.sources import fixtures

    got = W.QUERIES["otsu_threshold"](SF).to_pandas()
    assert len(got) > 0
    sample = got.sort_values("image_id").head(12)
    for r in sample.itertuples():
        i = int(r.image_id[3:])
        w = h = fixtures.SIZES[i % len(fixtures.SIZES)]
        fmt = fixtures.FMTS[i % len(fixtures.FMTS)]
        px = fixtures._pixels(i, w, h, 42)
        gray = imagecodec.decode(imagecodec.encode(px, fmt),
                                 fmt).astype(np.int64).sum(axis=2)
        hist = np.bincount(gray.ravel(), minlength=766)[:766]
        # independent brute: Fraction-based maximization
        from fractions import Fraction

        w0 = np.cumsum(hist)
        s0 = np.cumsum(np.arange(766, dtype=np.int64) * hist)
        wt, st = int(w0[-1]), int(s0[-1])
        best, best_v = -1, Fraction(-1)
        for t in range(765):
            den = int(w0[t]) * (wt - int(w0[t]))
            if den == 0:
                continue
            num = st * int(w0[t]) - wt * int(s0[t])
            v = Fraction(num * num, den)
            if v > best_v:
                best, best_v = t, v
        assert int(r.otsu_t) == best
        assert int(r.fg_px) == int((gray > best).sum())
        assert int(r.fg_px) + int(r.bg_px) == gray.size


def test_viewshed_hand_terrain():
    """Drive the PRODUCTION kernel on a hand terrain: a wall between
    the observer and a low plain blocks exactly the cells behind it;
    cells beside the wall stay visible; grazing (equal slope)
    blocks."""
    base = W.VS_RES * geo.RES_SHIFT

    def cell(gx, gy):
        return base + gy * (1 << 29) + gx

    # observer peak at (0, 0) h=100; wall at (3, 0) h=60; target
    # line y=0: cells x>3 see the wall at slope (60-100)/3 vs their
    # own (e-100)/x — e=0 at x=6: line height at k=3 is
    # 100 + (0-100)*3/6 = 50 < 60 -> blocked.
    df = pd.DataFrame({
        "cell": [cell(0, 0), cell(3, 0)],
        "n": [100, 60]})
    got = W._vs_visibility(df)
    vis = {int(c): int(v) for c, v in zip(got["cell"], got["visible"])}
    assert vis[cell(0, 0)] == 1          # observer sees itself
    assert vis[cell(1, 0)] == 1 and vis[cell(2, 0)] == 1
    assert vis[cell(3, 0)] == 1          # the wall's own top is seen
    assert vis[cell(4, 0)] == 0 and vis[cell(6, 0)] == 0  # shadow
    assert vis[cell(4, 4)] == 1          # off-axis unaffected
    # grazing: elevation exactly on the sight line blocks
    df2 = pd.DataFrame({"cell": [cell(0, 0), cell(2, 0)],
                        "n": [100, 50]})
    got2 = W._vs_visibility(df2)
    vis2 = {int(c): int(v) for c, v in zip(got2["cell"],
                                           got2["visible"])}
    # target (4,0) e=0: line at k=2 of K=4 is 100 + (0-100)*2/4 = 50
    # == wall -> grazing blocks
    assert vis2[cell(4, 0)] == 0


def test_viewshed_real_input_independent_walker():
    """Engine output at sf0.001 matches an independent (unvectorized)
    LOS walker over the same raster."""
    got = W.QUERIES["viewshed"](SF).to_pandas()
    n_grid = 1 << W.VS_RES
    assert len(got) == n_grid * n_grid
    elev = np.zeros((n_grid, n_grid), dtype=np.int64)
    _, x, y = geo.cell_decode(got["cell"].to_numpy(np.int64))
    elev[y, x] = got["elev"].to_numpy(np.int64)
    flat = elev.ravel()
    oy, ox = divmod(int(np.argmax(flat)), n_grid)
    h = int(elev[oy, ox])
    vis_map = {(int(gx), int(gy)): int(v) for gx, gy, v in
               zip(x, y, got["visible"])}
    for ty in range(n_grid):
        for tx in range(n_grid):
            et = int(elev[ty, tx])
            dx, dy = tx - ox, ty - oy
            K = max(abs(dx), abs(dy))
            visible = 1
            for k in range(1, K):
                # same sampling contract, scalar arithmetic
                if abs(dx) >= abs(dy):
                    sxs = 1 if dx > 0 else -1
                    cx = ox + sxs * k
                    cy = (2 * oy * K + 2 * dy * sxs * (cx - ox) + K) \
                        // (2 * K)
                else:
                    sys_ = 1 if dy > 0 else -1
                    cy = oy + sys_ * k
                    cx = (2 * ox * K + 2 * dx * sys_ * (cy - oy) + K) \
                        // (2 * K)
                if (int(elev[cy, cx]) - h) * K >= (et - h) * k:
                    visible = 0
                    break
            assert vis_map[(tx, ty)] == visible, (tx, ty)
