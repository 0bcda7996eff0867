"""Wave-37 checks: Q11-share vs oracle + threshold sanity, degree
histogram vs oracle + conservation, greedy matching vs full brute."""
import numpy as np
import pandas as pd

from oluray.pipelines import queries_wave37 as W

SF = "/root/testdata/sf0.001"


def _oracle_df(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ("lineitem", "events", "customer"):
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


def test_important_oracle_exact():
    got = W.QUERIES["important_parts"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["important_parts"]))


def test_important_threshold():
    import duckdb

    total, n_parts = duckdb.sql(
        f"SELECT SUM(rev), count(*) FROM (SELECT l_partkey, "
        f"SUM(round(l_extendedprice*(1.0-l_discount)*100.0, 0)"
        f"::BIGINT) rev FROM read_parquet('{SF}/lineitem.parquet') "
        f"GROUP BY 1)").fetchall()[0]
    got = W.QUERIES["important_parts"](SF).to_pandas()
    assert (W.SHARE_DEN * n_parts * got["rev_cents"].astype(object)
            >= W.SHARE_NUM * int(total)).all()
    # selective but nonempty
    assert 0 < len(got) < n_parts


def test_degree_hist_oracle_exact():
    got = W.QUERIES["degree_hist"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["degree_hist"]))


def test_degree_hist_conservation():
    """Bucket counts sum to the node count of the canonical graph."""
    import duckdb

    from oluray.pipelines import queries as Q

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')")
    n_nodes = con.sql(
        f"WITH {Q._EDGES_CTE} SELECT count(DISTINCT node) FROM ("
        f"SELECT LEAST(a,b) node FROM edges UNION "
        f"SELECT GREATEST(a,b) FROM edges)").fetchall()[0][0]
    got = W.QUERIES["degree_hist"](SF).to_pandas()
    assert int(got["n_nodes"].sum()) == n_nodes
    assert (got["log2_bucket"] >= 0).all()


def test_greedy_matching_brute():
    """The distributed candidate-pruned result equals a full O(F*C)
    brute greedy, every side used at most once, features exhausted."""
    import duckdb

    from oluray.functions import geo
    from oluray.pipelines.queries import KNN_FEATURES

    keys = duckdb.sql(
        f"SELECT c_custkey FROM read_parquet('{SF}/customer.parquet')"
    ).df()["c_custkey"].to_numpy(np.int64)
    xu, yu = geo.derive_units(keys)
    cand = []
    for f, flon, flat_ in KNN_FEATURES:
        fx = int(np.round((flon + 180.0) * 1e7))
        fy = int(np.round((flat_ + 90.0) * 1e7))
        d = np.abs(xu - fx) + np.abs(yu - fy)
        for c, dd in zip(keys, d):
            cand.append((int(dd), int(f), int(c)))
    cand.sort()
    used_f, used_c, exp = set(), set(), []
    for dd, f, c in cand:
        if f in used_f or c in used_c:
            continue
        used_f.add(f)
        used_c.add(c)
        exp.append((f, c, dd))
    got = W.QUERIES["greedy_matching"](SF).to_pandas()
    act = sorted(zip(got["feature_id"].astype(int),
                     got["c_custkey"].astype(int),
                     got["dist_l1"].astype(int)))
    assert act == sorted(exp)
    assert got["feature_id"].is_unique and got["c_custkey"].is_unique
    assert len(got) == len(KNN_FEATURES)
