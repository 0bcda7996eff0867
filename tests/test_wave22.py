"""Wave-22 checks: phrase search vs oracle + a hand tokenization
case, survival table vs oracle + KM invariants, local clustering vs
oracle + LCC bounds."""
import numpy as np
import pandas as pd

from oluray.pipelines import queries_wave22 as W

SF = "/root/testdata/sf0.001"


def _oracle_df(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ("events", "documents"):
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


def test_phrase_oracle_exact():
    got = W.QUERIES["phrase_search"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["phrase_search"]))


def test_phrase_token_semantics():
    """The regex counts exactly adjacent-token occurrences: partial
    words don't match, intervening tokens don't match, repeated
    phrases count non-overlapping."""
    s = pd.Series([
        "a hash join b",           # 1
        "hash  join",              # 1 (multi-space separator)
        "hash join hash join",     # 2
        "rehash join",             # 0 (partial word)
        "hash joint",              # 0 (partial word)
        "hash x join",             # 0 (intervening token)
        "hash, join!",             # 1 (punctuation separator)
    ])
    assert s.str.count(W._PHRASE_RE).tolist() == [1, 1, 2, 0, 0, 0, 1]


def test_survival_oracle_exact():
    got = W.QUERIES["survival_table"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["survival_table"]))


def test_survival_invariants():
    """n_risk is the suffix sum of departures; totals conserve the
    user count; n_risk strictly decreasing in day."""
    import duckdb

    got = W.QUERIES["survival_table"](SF).to_pandas() \
        .sort_values("day").reset_index(drop=True)
    n_users = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM "
        f"read_parquet('{SF}/events.parquet')").fetchall()[0][0]
    dep = got["d_event"] + got["n_censor"]
    assert int(dep.sum()) == n_users
    assert int(got["n_risk"].iloc[0]) == n_users - int(
        dep.iloc[:0].sum())
    # suffix-sum identity at every row
    suffix = dep[::-1].cumsum()[::-1].to_numpy()
    assert (got["n_risk"].to_numpy() == suffix).all()
    assert (np.diff(got["n_risk"].to_numpy()) < 0).all()


def test_edges_cte_in_sync():
    """Wave-22's local copy of the interaction-edges CTE must stay
    identical to the canonical definition in queries.py."""
    from oluray.pipelines import queries as Q

    assert W._EDGES_CTE == Q._EDGES_CTE


def test_local_clustering_oracle_exact():
    got = W.QUERIES["local_clustering"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["local_clustering"]))


def test_local_clustering_bounds():
    """0 <= 2*n_tri <= deg*(deg-1); deg >= 1; triangle nodes have
    deg >= 2."""
    got = W.QUERIES["local_clustering"](SF).to_pandas()
    deg = got["deg"].to_numpy(np.int64)
    tri = got["n_tri"].to_numpy(np.int64)
    assert (deg >= 1).all()
    assert (tri >= 0).all()
    assert (2 * tri <= deg * (deg - 1)).all()
    assert (deg[tri > 0] >= 2).all()
