"""Wave-41 checks: LTV curve vs oracle + conservation, Theil-Sen vs
an independent float brute + hand series."""
import numpy as np
import pandas as pd

from oluray.pipelines import queries_wave41 as W

SF = "/root/testdata/sf0.001"


def _oracle_df(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ("orders", "events"):
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


def test_ltv_oracle_exact():
    got = W.QUERIES["ltv_curve"](SF).to_pandas()
    assert len(got) > 1
    _assert_equal(got, _oracle_df(W.ORACLE["ltv_curve"]))


def test_ltv_conservation():
    import duckdb

    n, total = duckdb.sql(
        f"SELECT count(*), SUM(round(o_totalprice*100.0, 0)::BIGINT) "
        f"FROM read_parquet('{SF}/orders.parquet')").fetchall()[0]
    got = W.QUERIES["ltv_curve"](SF).to_pandas()
    assert int(got["n_orders"].sum()) == n
    assert int(got["cents"].astype(object).sum()) == int(total)
    assert (got["tenure_month"] >= 0).all()
    # month 0 contains every customer's first order
    n_cust = duckdb.sql(
        f"SELECT count(DISTINCT o_custkey) FROM "
        f"read_parquet('{SF}/orders.parquet')").fetchall()[0][0]
    m0 = int(got.loc[got["tenure_month"] == 0, "n_orders"].iloc[0])
    assert m0 >= n_cust


def test_theil_sen_kernel():
    """Hand series + random series vs a float brute (the exact
    fraction must equal the float median when distances are safe)."""
    # perfect line: slope exactly 2
    days = np.arange(10, dtype=np.int64)
    counts = 2 * days + 7
    assert W.theil_sen_fraction(days, counts) == (2, 1)
    # one outlier does not move the median slope
    c2 = counts.copy()
    c2[5] += 1000
    num, den = W.theil_sen_fraction(days, c2)
    assert (num, den) == (2, 1)
    rng = np.random.default_rng(13)
    for _ in range(5):
        n = int(rng.integers(3, 14))
        d = np.sort(rng.choice(100, n, replace=False)).astype(np.int64)
        c = rng.integers(0, 50, n).astype(np.int64)
        from fractions import Fraction

        brute = sorted(
            Fraction(int(c[j] - c[i]), int(d[j] - d[i]))
            for i in range(n) for j in range(i + 1, n))
        f = brute[(len(brute) - 1) // 2]
        assert W.theil_sen_fraction(d, c) == (f.numerator,
                                              f.denominator)


def test_theil_sen_real():
    got = W.QUERIES["theil_sen"](SF)
    got = (got.to_pandas() if hasattr(got, "to_pandas") else got).iloc[0]
    assert int(got["slope_den"]) >= 1
    assert int(got["n_days"]) >= 3
