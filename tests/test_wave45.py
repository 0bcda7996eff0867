"""Wave-45 checks: peak window vs oracle + brute per-type scan."""
import numpy as np
import pandas as pd

from oluray.pipelines import queries_wave45 as W

SF = "/root/testdata/sf0.001"


def _oracle_df(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')")
    return con.sql(sql).df()


def test_peak_oracle_exact():
    got = W.QUERIES["peak_window"](SF).to_pandas()
    assert len(got) == 5
    exp = _oracle_df(W.ORACLE["peak_window"])
    cols = sorted(got.columns)
    assert sorted(exp.columns) == cols
    gs = got[cols].sort_values(cols).reset_index(drop=True)
    es = exp[cols].sort_values(cols).reset_index(drop=True)
    assert (gs.astype(str).values == es.astype(str).values).all()


def test_peak_brute():
    import duckdb

    ev = duckdb.sql(
        f"SELECT event_type, epoch_us(ts) t FROM "
        f"read_parquet('{SF}/events.parquet')").df()
    got = W.QUERIES["peak_window"](SF).to_pandas() \
        .set_index("event_type")
    for et, sub in ev.groupby("event_type"):
        ts = np.sort(sub["t"].to_numpy(np.int64))
        best, anchor = 0, None
        for t0 in ts:
            n = int(((ts >= t0) & (ts < t0 + W._WIN_US)).sum())
            if n > best:
                best, anchor = n, int(t0)
        assert int(got.loc[et, "peak_n"]) == best
        assert int(got.loc[et, "anchor_us"]) == anchor
        # peak window really contains peak_n events
        assert best >= 1
