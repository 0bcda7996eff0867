"""Wave-12 checks: CUSUM detects an injected shift, SNM window
invariants + oracle, FD semantics on constructed data."""
import numpy as np
import pandas as pd

from oluray.pipelines import queries_wave12 as W

SF = "/root/testdata/sf0.001"


def _oracle_df(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ("events", "customer", "part", "orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    return con.sql(sql).df()


def _assert_equal(got: pd.DataFrame, exp: pd.DataFrame) -> None:
    cols = sorted(got.columns)
    gs = got[cols].sort_values(cols).reset_index(drop=True)
    es = exp[cols].sort_values(cols).reset_index(drop=True)
    assert gs.shape == es.shape
    assert (gs.astype(str).values == es.astype(str).values).all()


def test_cusum_oracle_exact():
    got = W.QUERIES["cusum_alerts"](SF).to_pandas()
    _assert_equal(got, _oracle_df(W.ORACLE["cusum_alerts"]))
    assert (got["cusum_max"] >= 0).all()


def test_cusum_detects_shift():
    # reference implementation on constructed series: a mean shift in
    # the second half must score far above white noise
    def cusum_max(x: np.ndarray) -> int:
        n = len(x)
        dev = x * n - x.sum()
        cum = np.cumsum(dev)
        mn = np.minimum(np.minimum.accumulate(cum), 0)
        return int((cum - mn).max())

    rng = np.random.default_rng(0)
    flat = rng.integers(90, 110, 200).astype(np.int64)
    shifted = flat.copy()
    shifted[100:] += 50
    assert cusum_max(shifted) > 5 * cusum_max(flat)


def test_snm_oracle_exact_and_window_shape():
    got = W.QUERIES["snm_pairs"](SF).to_pandas()
    _assert_equal(got, _oracle_df(W.ORACLE["snm_pairs"]))
    cust = pd.read_parquet(f"{SF}/customer.parquet",
                           columns=["c_custkey"])
    n = len(cust)
    # exactly W neighbors per rank except the tail ranks
    expect = sum(min(W.SNM_W, n - 1 - i) for i in range(n))
    assert len(got) == expect
    assert set(got["dist"]) == set(range(1, W.SNM_W + 1))
    # balance gaps are non-negative (pairs follow sort order)
    assert (got["bal_gap"] >= 0).all()


def test_fd_semantics():
    got = W.QUERIES["fd_check"](SF)  # already a pandas DataFrame
    _assert_equal(got, _oracle_df(W.ORACLE["fd_check"]))
    by = got.set_index(["tbl", "lhs", "rhs"])
    # key columns functionally determine everything
    assert int(by.loc[("part", "p_partkey", "p_brand"), "holds"]) == 1
    assert int(by.loc[("customer", "c_custkey", "c_mktsegment"),
                      "holds"]) == 1
    assert int(by.loc[("orders", "o_orderkey", "o_orderstatus"),
                      "holds"]) == 1
    # a 5-value segment can't determine 25 nations
    assert int(by.loc[("customer", "c_mktsegment", "c_nationkey"),
                      "holds"]) == 0
