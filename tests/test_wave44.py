"""Wave-44 checks: Life step vs oracle + blinker/block/lonely-cell
hand patterns, active runs vs oracle + conservation."""
import numpy as np
import pandas as pd

from oluray.functions import geo
from oluray.pipelines import queries_wave44 as W

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


def _cell(gx, gy):
    return W.LIFE_RES * geo.RES_SHIFT + gy * (1 << 29) + gx


def test_life_oracle_exact():
    got = W.QUERIES["life_step"](SF).to_pandas()
    _assert_equal(got, _oracle_df(W.ORACLE["life_step"]))


def test_life_hand_patterns():
    # block (2x2) is a still life
    block = [_cell(5, 5), _cell(6, 5), _cell(5, 6), _cell(6, 6)]
    got = W._life_fold(pd.DataFrame({"cell": block}))
    assert set(got["cell"].astype(int)) == set(block)
    # blinker (vertical -> horizontal)
    vert = [_cell(10, 9), _cell(10, 10), _cell(10, 11)]
    horiz = {_cell(9, 10), _cell(10, 10), _cell(11, 10)}
    got2 = W._life_fold(pd.DataFrame({"cell": vert}))
    assert set(got2["cell"].astype(int)) == horiz
    # lonely cell dies; empty board stays empty
    got3 = W._life_fold(pd.DataFrame({"cell": [_cell(3, 3)]}))
    assert len(got3) == 0
    got4 = W._life_fold(pd.DataFrame({"cell": []}))
    assert len(got4) == 0


def test_active_runs_oracle_exact():
    got = W.QUERIES["active_runs"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["active_runs"]))


def test_active_runs_conservation():
    import duckdb

    n_days = duckdb.sql(
        f"SELECT count(DISTINCT epoch_us(ts) // {W._DAY_US}) FROM "
        f"read_parquet('{SF}/events.parquet')").fetchall()[0][0]
    got = W.QUERIES["active_runs"](SF).to_pandas()
    assert int((got["run_len"].astype(object)
                * got["n_runs"].astype(object)).sum()) == n_days
    assert (got["run_len"] >= 1).all() and (got["n_runs"] >= 1).all()
