"""Wave-30 checks: rapid reorders vs oracle + brute pair sweep,
temporal drift vs oracle + conservation identities."""
import numpy as np
import pandas as pd

from oluray.pipelines import queries_wave30 as W

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


def test_reorders_oracle_exact():
    got = W.QUERIES["rapid_reorders"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["rapid_reorders"]))


def test_reorders_brute():
    """Brute all-pairs sweep over raw rows reproduces the pair set."""
    import duckdb

    o = duckdb.sql(
        f"SELECT o_orderkey k, o_custkey ck, "
        f"epoch_us(o_orderdate::TIMESTAMP) // 86400000000 AS day "
        f"FROM read_parquet('{SF}/orders.parquet')").df()
    exp = set()
    rows = o.to_numpy()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            if a[1] == b[1] and \
                    abs(int(a[2]) - int(b[2])) <= W.DUP_WINDOW_DAYS:
                exp.add((min(int(a[0]), int(b[0])),
                         max(int(a[0]), int(b[0]))))
    got = W.QUERIES["rapid_reorders"](SF).to_pandas()
    assert set(zip(got["o1"].astype(int), got["o2"].astype(int))) == exp
    assert got["day_gap"].between(0, W.DUP_WINDOW_DAYS).all()


def test_tdrift_oracle_exact():
    got = W.QUERIES["temporal_drift"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["temporal_drift"]))


def test_tdrift_conservation():
    import pyarrow.parquet as pq

    got = W.QUERIES["temporal_drift"](SF).to_pandas()
    n = pq.read_metadata(f"{SF}/events.parquet").num_rows
    assert int(got["n_early"].sum()) + int(got["n_late"].sum()) == n
    assert int(got["d"].astype(object).sum()) == 0
    te, tl = int(got["n_early"].sum()), int(got["n_late"].sum())
    d = (got["n_early"].astype(object) * tl
         - got["n_late"].astype(object) * te)
    assert (d == got["d"].astype(object)).all()
