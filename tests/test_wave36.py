"""Wave-36 checks: heat diffusion vs oracle + hand impulse + mass
conservation, Pareto point vs oracle + brute scan."""
import numpy as np
import pandas as pd

from oluray.functions import geo
from oluray.pipelines import queries_wave36 as W

SF = "/root/testdata/sf0.001"


def _oracle_df(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ("events", "orders"):
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


def test_heat_oracle_exact():
    got = W.QUERIES["heat_steps"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["heat_steps"]))


def test_heat_impulse():
    """Unit impulse in the interior: after 3 steps the center is 13
    (3-step lazy walks returning to origin: stay^3 = 1, plus
    {stay, +d, -d} permutations = 2 axes x 3! = 12; three proper
    moves can't net zero by parity) and total mass is 5^3 = 125;
    a corner impulse loses mass off the border."""
    base = W.HEAT_RES * geo.RES_SHIFT

    def cell(gx, gy):
        return base + gy * (1 << 29) + gx

    got = W._heat_apply(pd.DataFrame({"cell": [cell(8, 8)], "v": [1]}))
    m = {int(c): int(v) for c, v in zip(got["cell"], got["v3"])}
    assert sum(m.values()) == 125
    assert m[cell(8, 8)] == 13
    # symmetric: the 4 axial distance-1 neighbors are equal
    assert (m[cell(7, 8)] == m[cell(9, 8)] == m[cell(8, 7)]
            == m[cell(8, 9)])
    corner = W._heat_apply(pd.DataFrame({"cell": [cell(0, 0)],
                                         "v": [1]}))
    assert int(corner["v3"].sum()) < 125


def test_pareto_oracle_exact():
    got = W.QUERIES["pareto_point"](SF)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    assert len(got) == 1
    _assert_equal(got, _oracle_df(W.ORACLE["pareto_point"]))


def test_pareto_brute():
    import duckdb

    sp = duckdb.sql(
        f"SELECT o_custkey ck, SUM(round(o_totalprice*100.0, 0)"
        f"::BIGINT)::BIGINT spend FROM "
        f"read_parquet('{SF}/orders.parquet') GROUP BY 1").df()
    sp = sp.sort_values(["spend", "ck"], ascending=[False, True])
    s = sp["spend"].to_numpy(np.int64)
    total = int(s.sum())
    cum = 0
    k = 0
    for v in s:
        cum += int(v)
        k += 1
        if W.PARETO_DEN * cum >= W.PARETO_NUM * total:
            break
    got = W.QUERIES["pareto_point"](SF)
    got = (got.to_pandas() if hasattr(got, "to_pandas") else got).iloc[0]
    assert int(got["k80"]) == k
    assert int(got["cents_k80"]) == cum
    assert int(got["cents_total"]) == total
    assert int(got["n_customers"]) == len(sp)
    # the 80/20 shape: far fewer than all customers needed
    assert k < len(sp)
