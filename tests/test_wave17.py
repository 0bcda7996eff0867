"""Wave-17 checks: D8 accumulation vs oracle + a hand-built basin,
cube rollup vs GROUPING SETS + lattice consistency, mipmap chain vs
an independent reference."""
import numpy as np
import pandas as pd

from oluray.functions import geo
from oluray.pipelines import queries_wave17 as W

SF = "/root/testdata/sf0.001"


def _oracle_df(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ("events", "orders", "documents"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    return con.sql(sql).df()


def _assert_equal(got: pd.DataFrame, exp: pd.DataFrame) -> None:
    cols = sorted(got.columns)
    gs = got[cols].sort_values(cols).reset_index(drop=True)
    es = exp[cols].sort_values(cols).reset_index(drop=True)
    assert gs.shape == es.shape
    assert (gs.astype(str).values == es.astype(str).values).all()


def test_flow_accum_oracle_exact():
    got = W.QUERIES["flow_accum"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["flow_accum"]))


def test_flow_accum_hand_basin():
    """Drive the PRODUCTION kernel on a hand-built basin: chain
    5 -> 3 -> 1 plus an isolated peak (no lower neighbor) and a
    diagonal feeder. The sink accumulates its whole upstream path."""
    from oluray.pipelines.queries_wave17 import _fa_accumulate

    base = W.FA_RES * geo.RES_SHIFT

    def cell(gx, gy):
        return base + gy * geo.Y_SHIFT + gx

    df = pd.DataFrame({
        "cell": [cell(2, 2), cell(3, 2), cell(4, 2), cell(9, 9),
                 cell(3, 3)],
        "n": [5, 3, 1, 7, 4]})
    got = _fa_accumulate(df)
    act = dict(zip(got["cell"].astype(int),
                   got["n_upstream"].astype(int)))
    # 5@(2,2) -> 3@(3,2); 4@(3,3) -> 1@(4,2) (its strictly-lowest
    # neighbor); 3@(3,2) -> 1@(4,2); peak 7@(9,9) is a sink with no
    # inflow. (4,2) receives 3 upstream cells, (3,2) one.
    assert act == {cell(3, 2): 1, cell(4, 2): 3}
    # tie-break determinism: two equal-lowest neighbors pick the
    # smaller (gx, gy)
    df2 = pd.DataFrame({
        "cell": [cell(5, 5), cell(4, 5), cell(6, 5)],
        "n": [9, 2, 2]})
    got2 = _fa_accumulate(df2)
    act2 = dict(zip(got2["cell"].astype(int),
                    got2["n_upstream"].astype(int)))
    assert act2 == {cell(4, 5): 1}


def test_cube_rollup_oracle_exact_and_lattice():
    got = W.QUERIES["cube_rollup"](SF).to_pandas()
    _assert_equal(got, _oracle_df(W.ORACLE["cube_rollup"]))
    # lattice consistency: every coarser set sums the finer one
    fine = got[(got["cell"] != -1) & (got["day"] != "ALL")]
    tot = got[(got["cell"] == -1) & (got["day"] == "ALL")]
    assert len(tot) == 1
    assert int(tot["n_events"].iloc[0]) == int(fine["n_events"].sum())
    assert int(tot["sum_value"].iloc[0]) == int(fine["sum_value"].sum())
    bycell = got[(got["cell"] != -1) & (got["day"] == "ALL")]
    chk = fine.groupby("cell")["n_events"].sum()
    assert all(int(chk[c]) == int(n)
               for c, n in zip(bycell["cell"], bycell["n_events"]))


def test_image_pyramid_reference():
    got = W.QUERIES["image_pyramid"](SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    from oluray.functions import imagecodec
    from oluray.pipelines.queries_wave17 import MipmapStats
    from oluray.sources import fixtures

    # px_sum conserved across every level of every image
    per = got.groupby(["image_id", "level"])["px_sum"].first().unstack()
    assert per.nunique(axis=1).eq(1).all()
    for doc_id in docs["doc_id"].iloc[:6]:
        iid = f"img{int(doc_id):08d}"
        wpx = fixtures.SIZES[int(doc_id) % len(fixtures.SIZES)]
        fmt = fixtures.FMTS[int(doc_id) % len(fixtures.FMTS)]
        a = imagecodec.decode(
            imagecodec.encode(fixtures._pixels(int(doc_id), wpx, wpx, 42),
                              fmt), fmt).astype(np.int64).sum(axis=2)
        exp = []
        lvl = 0
        while True:
            exp.append((lvl, a.shape[0], a.shape[1],
                        int((a * a).sum()), int(a.sum())))
            if a.shape == (1, 1):
                break
            # independent halving: pad-free reduceat on both axes
            h, w = a.shape
            rows = np.add.reduceat(a, np.arange(0, h, 2), axis=0)
            a = np.add.reduceat(rows, np.arange(0, w, 2), axis=1)
            lvl += 1
        sub = got[got["image_id"] == iid].sort_values("level")
        act = list(zip(sub["level"], sub["h"], sub["w"],
                       sub["sum_sq"], sub["px_sum"]))
        assert [tuple(map(int, r)) for r in act] == exp
