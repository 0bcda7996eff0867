"""Wave-42 checks: HITS vs oracle + brute matrix iteration, max
rectangle vs exhaustive brute + hand lattices."""
import numpy as np
import pandas as pd

from oluray.functions import geo
from oluray.pipelines import queries_wave42 as W

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


def test_hits_oracle_exact():
    got = W.QUERIES["hits_scores"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["hits_scores"]))


def test_hits_brute_matrix():
    """Dense-matrix replication of the exact iterations."""
    import duckdb

    from oluray.pipelines import queries as Q

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')")
    de = con.sql(f"WITH {Q._EDGES_CTE} SELECT DISTINCT a, b "
                 f"FROM edges").df()
    nodes = sorted(set(de["a"].astype(int)) | set(de["b"].astype(int)))
    ix = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)), dtype=np.int64)
    for a, b in zip(de["a"].astype(int), de["b"].astype(int)):
        A[ix[a], ix[b]] = 1
    a1 = A.T @ np.ones(len(nodes), dtype=np.int64)
    h1 = A @ a1
    a2 = A.T @ h1
    got = W.QUERIES["hits_scores"](SF).to_pandas().set_index("node")
    for v in nodes:
        hub = int(h1[ix[v]])
        auth = int(a2[ix[v]])
        if hub == 0 and auth == 0:
            assert v not in got.index
        else:
            assert int(got.loc[v, "hub"]) == hub
            assert int(got.loc[v, "auth"]) == auth


def _brute_max_rect(occ: np.ndarray) -> int:
    n, m = occ.shape
    best = 0
    for y0 in range(n):
        for y1 in range(y0, n):
            run = 0
            cols_ok = occ[y0:y1 + 1].all(axis=0)
            for x in range(m):
                run = run + 1 if cols_ok[x] else 0
                best = max(best, run * (y1 - y0 + 1))
    return best


def test_max_rect_hand_and_random():
    base = W.MR_RES * geo.RES_SHIFT

    def cell(gx, gy):
        return base + gy * (1 << 29) + gx

    # 3x2 solid block
    cells = [cell(x, y) for x in range(2, 5) for y in range(7, 9)]
    got = W._max_rect(pd.DataFrame({"cell": cells}))
    r = got.iloc[0]
    assert int(r["area"]) == 6
    assert (int(r["y_lo"]), int(r["x_lo"]), int(r["y_hi"]),
            int(r["x_hi"])) == (7, 2, 8, 4)
    # empty lattice
    assert int(W._max_rect(pd.DataFrame({"cell": []}))
               .iloc[0]["area"]) == 0
    # random lattices vs brute area
    rng = np.random.default_rng(21)
    n = 1 << W.MR_RES
    for _ in range(6):
        occ = rng.random((n, n)) < 0.45
        ys, xs = np.nonzero(occ)
        cells = [cell(int(x), int(y)) for x, y in zip(xs, ys)]
        got = W._max_rect(pd.DataFrame({"cell": cells}))
        r = got.iloc[0]
        assert int(r["area"]) == _brute_max_rect(occ)
        # the returned rectangle really is fully occupied
        if int(r["area"]) > 0:
            sub = occ[int(r["y_lo"]):int(r["y_hi"]) + 1,
                      int(r["x_lo"]):int(r["x_hi"]) + 1]
            assert sub.all() and sub.size == int(r["area"])


def test_max_rect_real():
    got = W.QUERIES["max_rectangle"](SF).to_pandas()
    r = got.iloc[0]
    assert int(r["area"]) >= 1
    assert (int(r["y_hi"]) - int(r["y_lo"]) + 1) * \
        (int(r["x_hi"]) - int(r["x_lo"]) + 1) == int(r["area"])
