"""Wave-46 checks: punchcard vs oracle + conservation."""
import pandas as pd

from oluray.pipelines import queries_wave46 as W

SF = "/root/testdata/sf0.001"


def test_punchcard_oracle_exact():
    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')")
    got = W.QUERIES["punchcard"](SF).to_pandas()
    exp = con.sql(W.ORACLE["punchcard"]).df()
    cols = sorted(got.columns)
    assert sorted(exp.columns) == cols
    gs = got[cols].sort_values(cols).reset_index(drop=True)
    es = exp[cols].sort_values(cols).reset_index(drop=True)
    assert (gs.astype(str).values == es.astype(str).values).all()


def test_punchcard_conservation():
    import pyarrow.parquet as pq

    got = W.QUERIES["punchcard"](SF).to_pandas()
    n = pq.read_metadata(f"{SF}/events.parquet").num_rows
    assert int(got["n_events"].sum()) == n
    assert got["dow"].between(0, 6).all()
    assert got["hour"].between(0, 23).all()
    assert len(got) <= 168
