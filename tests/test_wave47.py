"""Wave-47 checks: ABC classes vs oracle + share invariants, stock
span vs oracle + hand series."""
import numpy as np
import pandas as pd

from oluray.pipelines import queries_wave47 as W

SF = "/root/testdata/sf0.001"


def _oracle_df(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ("lineitem", "events"):
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


def test_abc_oracle_exact():
    got = W.QUERIES["abc_class"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["abc_class"]))


def test_abc_shares():
    """All three classes occur, every part appears once, and the
    boundary property holds: revenue of A <= 80% of total, of
    A+B <= 95% (recomputed from raw rows)."""
    import duckdb

    got = W.QUERIES["abc_class"](SF).to_pandas()
    counts = got["abc"].value_counts()
    assert set(counts.index) == {"A", "B", "C"}
    assert got["l_partkey"].is_unique
    rev = duckdb.sql(
        f"SELECT l_partkey, SUM(round(l_extendedprice*(1.0-l_discount)"
        f"*100.0, 0)::BIGINT)::BIGINT rev FROM "
        f"read_parquet('{SF}/lineitem.parquet') GROUP BY 1").df()
    j = got.merge(rev, on="l_partkey")
    total = int(j["rev"].sum())
    rev_a = int(j.loc[j["abc"] == "A", "rev"].sum())
    rev_ab = rev_a + int(j.loc[j["abc"] == "B", "rev"].sum())
    assert W.ABC_A_DEN * rev_a <= W.ABC_A_NUM * total
    assert W.ABC_B_DEN * rev_ab <= W.ABC_B_NUM * total


def test_span_oracle_exact():
    got = W.QUERIES["stock_span"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["stock_span"]))


def test_span_hand():
    """Classic sequence 100,80,60,70,60,75,85 (consecutive days):
    spans 1,1,1,2,1,4,6."""
    df = pd.DataFrame({"day": np.arange(7, dtype=np.int64) + 50,
                       "c": [100, 80, 60, 70, 60, 75, 85]})
    got = W._span_fold(df)
    assert got["span"].tolist() == [1, 1, 1, 2, 1, 4, 6]
    # gap calendar: span measures calendar days
    df2 = pd.DataFrame({"day": [10, 14], "c": [5, 9]})
    got2 = W._span_fold(df2)
    assert got2["span"].tolist() == [1, 5]
