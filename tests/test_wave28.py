"""Wave-28 checks: delta-join IVM vs the monolithic oracle + term
disjointness, cluster terms vs oracle + brute top-k."""
import numpy as np
import pandas as pd

from oluray.pipelines import queries_wave28 as W

SF = "/root/testdata/sf0.001"


def _oracle_df(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ("orders", "customer", "documents", "embeddings"):
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


def test_ivm_oracle_exact():
    got = W.QUERIES["ivm_join"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["ivm_join"]))


def test_ivm_delta_terms_disjoint_and_partition():
    """The four view terms are pairwise disjoint and partition the
    full join: every output order appears exactly once, and each
    term's rows satisfy its base/delta membership predicate."""
    got = W.QUERIES["ivm_join"](SF).to_pandas()
    assert got["o_orderkey"].is_unique  # orders join one customer
    ob_delta = (got["o_orderkey"] % W.ORD_MOD) == 0
    cb_delta = (got["o_custkey"] % W.CUST_MOD) == 0
    # partition sizes reconstruct the term decomposition
    n_base = int((~ob_delta & ~cb_delta).sum())
    n_d1 = int((ob_delta & ~cb_delta).sum())
    n_d2 = int((~ob_delta & cb_delta).sum())
    n_d3 = int((ob_delta & cb_delta).sum())
    assert n_base + n_d1 + n_d2 + n_d3 == len(got)
    assert min(n_base, n_d1, n_d2, n_d3) > 0  # all four regimes real


def test_cluster_terms_oracle_exact():
    got = W.QUERIES["cluster_terms"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["cluster_terms"]))


def test_cluster_terms_brute():
    """Brute recompute from raw rows for one label."""
    import duckdb

    con = duckdb.connect()
    docs = con.sql(f"SELECT doc_id, text FROM "
                   f"read_parquet('{SF}/documents.parquet')").df()
    emb = con.sql(f"SELECT vec_id, label FROM "
                  f"read_parquet('{SF}/embeddings.parquet')").df()
    lab0 = set(emb.loc[emb["label"] == 0, "vec_id"].astype(int))
    from collections import Counter

    dfc = Counter()
    for r in docs.itertuples():
        if int(r.doc_id) in lab0:
            for t in set(W._TOKEN_RE.split(str(r.text).lower())):
                if t:
                    dfc[t] += 1
    exp = sorted(dfc.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    got = W.QUERIES["cluster_terms"](SF).to_pandas()
    g0 = got[got["label"] == 0].sort_values(
        ["df", "term"], ascending=[False, True])
    assert list(zip(g0["term"], g0["df"].astype(int))) == exp
