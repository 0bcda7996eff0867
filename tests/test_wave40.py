"""Wave-40 checks: Q-Q bands vs oracle + monotonicity, join counts
vs oracle + pair-total identity + hand checkerboard."""
import numpy as np
import pandas as pd

from oluray.functions import geo
from oluray.pipelines import queries_wave40 as W

SF = "/root/testdata/sf0.001"


def _oracle_df(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ("documents", "events"):
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


def test_qq_oracle_exact():
    got = W.QUERIES["qq_bands"](SF).to_pandas()
    assert len(got) == 9
    _assert_equal(got, _oracle_df(W.ORACLE["qq_bands"]))


def test_qq_monotone():
    got = W.QUERIES["qq_bands"](SF).to_pandas().sort_values("decile")
    assert (np.diff(got["q_a"].to_numpy(np.int64)) >= 0).all()
    assert (np.diff(got["q_b"].to_numpy(np.int64)) >= 0).all()


def test_join_counts_oracle_exact():
    got = W.QUERIES["join_counts"](SF).to_pandas()
    assert len(got) == 1
    _assert_equal(got, _oracle_df(W.ORACLE["join_counts"]))


def test_join_counts_total():
    """BB + WW + BW equals the rook-adjacent occupied pair count."""
    import duckdb

    lon, lat = geo.derive_lonlat_sql("event_id")
    x, y = geo.cell_xy_sql(lon, lat, W.JC_RES)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')")
    n_pairs = con.sql(f"""
        WITH c AS (SELECT DISTINCT x, y FROM
                   (SELECT {x} AS x, {y} AS y FROM events))
        SELECT count(*) FROM c a JOIN c t
          ON (t.x = a.x + 1 AND t.y = a.y)
          OR (t.x = a.x AND t.y = a.y + 1)""").fetchall()[0][0]
    got = W.QUERIES["join_counts"](SF).to_pandas().iloc[0]
    assert int(got["n_bb"]) + int(got["n_ww"]) + int(got["n_bw"]) \
        == n_pairs


def test_join_counts_hand_checkerboard():
    """Drive the kernel on a 4x4 checkerboard of counts {1, 3}
    (median 1 -> B iff 3): every rook pair is BW."""
    base = W.JC_RES * geo.RES_SHIFT

    def cell(gx, gy):
        return base + gy * (1 << 29) + gx

    cells, vals = [], []
    for gx in range(4):
        for gy in range(4):
            cells.append(cell(gx, gy))
            vals.append(3 if (gx + gy) % 2 else 1)
    got = W._jc_fold(pd.DataFrame({"cell": cells, "v": vals}))
    r = got.iloc[0]
    assert int(r["median_v"]) == 1
    assert int(r["n_bb"]) == 0 and int(r["n_ww"]) == 0
    assert int(r["n_bw"]) == 24  # 2 * 4 * 3 rook pairs on 4x4
