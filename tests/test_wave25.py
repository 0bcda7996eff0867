"""Wave-25 checks: HHI vs oracle + bounds, Mann-Kendall vs oracle +
brute pair count, greedy cover vs an independent brute greedy."""
import numpy as np
import pandas as pd

from oluray.functions import geo
from oluray.pipelines import queries_wave25 as W

SF = "/root/testdata/sf0.001"


def _oracle_df(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ("events",):
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


def test_diversity_oracle_exact():
    got = W.QUERIES["cell_diversity"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["cell_diversity"]))


def test_diversity_bounds():
    """1/k <= HHI <= 1 with k types, cross-multiplied exactly:
    hhi_num <= hhi_den (HHI <= 1) and k*hhi_num >= hhi_den
    (Cauchy-Schwarz lower bound HHI >= 1/k)."""
    got = W.QUERIES["cell_diversity"](SF).to_pandas()
    num = got["hhi_num"].astype(object)
    den = got["hhi_den"].astype(object)
    k = got["n_types"].astype(object)
    assert (num <= den).all()
    assert (k * num >= den).all()
    assert (got["n_types"] >= 1).all()


def test_trend_oracle_exact():
    got = W.QUERIES["trend_test"](SF).to_pandas()
    assert len(got) == 5
    _assert_equal(got, _oracle_df(W.ORACLE["trend_test"]))


def test_mk_kernel_brute():
    """_mk_s equals the naive double loop on random series incl. time
    and value ties."""
    rng = np.random.default_rng(11)
    for _ in range(10):
        n = int(rng.integers(2, 120))
        ts = rng.integers(0, 40, n).astype(np.int64)  # many time ties
        v = rng.integers(0, 15, n).astype(np.float64)  # value ties
        brute = 0
        for i in range(n):
            for j in range(n):
                if ts[i] < ts[j]:
                    brute += int(v[j] > v[i]) - int(v[j] < v[i])
        assert W._mk_s(ts, v) == brute


def test_greedy_cover_brute():
    """Kernel vs an independent greedy on a hand lattice; coverage
    target respected; gains non-increasing."""
    base = W.COVER_RES * geo.RES_SHIFT

    def cell(gx, gy):
        return base + gy * (1 << 29) + gx

    # one dense blob (40) far from two mid cells (15 each, adjacent)
    df = pd.DataFrame({
        "cell": [cell(2, 2), cell(10, 10), cell(11, 10)],
        "v": [40, 15, 15]})
    got = W._greedy_cover(df)
    # total 70, target 35: first pick must be the blob (gain 40 >= 35)
    assert list(got["cell"]) == [cell(2, 2)]
    assert list(got["gain"]) == [40]
    assert list(got["cum_covered"]) == [40]
    # second lattice: two equal candidates -> smaller (y, x) wins
    df2 = pd.DataFrame({"cell": [cell(5, 5), cell(9, 9)],
                        "v": [10, 10]})
    got2 = W._greedy_cover(df2)
    assert got2["cell"].iloc[0] == cell(5, 5)


def test_greedy_cover_real_invariants():
    got = W.QUERIES["set_cover_greedy"](SF).to_pandas()
    assert len(got) >= 1
    g = got["gain"].to_numpy(np.int64)
    assert (g > 0).all()
    assert (np.diff(g) <= 0).all()  # greedy gains non-increasing
    assert (got["cum_covered"].to_numpy(np.int64)
            == np.cumsum(g)).all()
