"""Wave-34 checks: postings sizing vs oracle + hand varint cases,
RFM vs oracle + tile-balance invariants."""
import numpy as np
import pandas as pd

from oluray.pipelines import queries_wave34 as W

SF = "/root/testdata/sf0.001"


def _oracle_df(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ("documents", "orders"):
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


def test_varint_bytes():
    v = np.array([0, 1, 127, 128, 16383, 16384, 2097151, 2097152,
                  268435455, 268435456], dtype=np.int64)
    assert W.varint_bytes(v).tolist() == [1, 1, 1, 2, 2, 3, 3, 4,
                                          4, 5]


def test_postings_oracle_exact():
    got = W.QUERIES["postings_size"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["postings_size"]))


def test_postings_invariants():
    """bytes >= df (each posting >= 1 byte) and bytes <= 5*df."""
    got = W.QUERIES["postings_size"](SF).to_pandas()
    assert (got["bytes"] >= got["df"]).all()
    assert (got["bytes"] <= 5 * got["df"]).all()
    # delta coding: a dense term's gaps are tiny -> bytes close to df
    dense = got.sort_values("df", ascending=False).iloc[0]
    assert int(dense["bytes"]) <= 2 * int(dense["df"]) + 4


def test_rfm_oracle_exact():
    got = W.QUERIES["rfm_scores"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["rfm_scores"]))


def test_rfm_balance():
    """Each tile column is 1..5 and balanced within 1 row."""
    got = W.QUERIES["rfm_scores"](SF).to_pandas()
    assert got["c_custkey"].is_unique
    for c in ("r_tile", "f_tile", "m_tile"):
        assert got[c].between(1, W.RFM_K).all()
        sizes = got.groupby(c).size()
        assert len(sizes) == W.RFM_K
        assert sizes.max() - sizes.min() <= 1
