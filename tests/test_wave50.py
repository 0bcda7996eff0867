"""Wave-50 checks: max drawdown vs oracle + hand series."""
import pandas as pd

from oluray.pipelines import queries_wave50 as W

SF = "/root/testdata/sf0.001"


def test_dd_oracle_exact():
    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')")
    got = W.QUERIES["max_drawdown"](SF).to_pandas()
    exp = con.sql(W.ORACLE["max_drawdown"]).df()
    cols = sorted(got.columns)
    assert sorted(exp.columns) == cols
    gs = got[cols].sort_values(cols).reset_index(drop=True)
    es = exp[cols].sort_values(cols).reset_index(drop=True)
    assert (gs.astype(str).values == es.astype(str).values).all()


def test_dd_hand():
    """Daily cents 10, -4, +2, -7, +20: cum = 10, 6, 8, 1, 21; peak
    10, 10, 10, 10, 21; dd = 0, 4, 2, 9, 0 -> D=9 at day 4, peak at
    day 1. A monotone series has drawdown 0."""
    df = pd.DataFrame({"day": [1, 2, 3, 4, 5],
                       "cents": [10, -4, 2, -7, 20]})
    got = W._dd_fold(df).iloc[0]
    assert int(got["drawdown_cents"]) == 9
    assert int(got["trough_day"]) == 4
    assert int(got["peak_day"]) == 1
    mono = pd.DataFrame({"day": [1, 2, 3], "cents": [5, 5, 5]})
    got2 = W._dd_fold(mono).iloc[0]
    assert int(got2["drawdown_cents"]) == 0
    # tie on the peak value: FIRST day attaining it wins
    tie = pd.DataFrame({"day": [1, 2, 3, 4],
                        "cents": [7, -7, 7, -3]})
    got3 = W._dd_fold(tie).iloc[0]
    # cum 7, 0, 7, 4; peak 7...; dd 0, 7, 0, 3 -> D=7 trough day 2,
    # peak = first day with cum == 7 -> day 1
    assert (int(got3["drawdown_cents"]), int(got3["peak_day"]),
            int(got3["trough_day"])) == (7, 1, 2)
