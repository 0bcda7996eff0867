"""Wave-48 checks: modularity components vs oracle + handshake and
conservation identities."""
import pandas as pd

from oluray.pipelines import queries_wave48 as W

SF = "/root/testdata/sf0.001"


def test_modularity_oracle_exact():
    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')")
    got = W.QUERIES["modularity_parts"](SF).to_pandas()
    exp = con.sql(W.ORACLE["modularity_parts"]).df()
    cols = sorted(got.columns)
    assert sorted(exp.columns) == cols
    gs = got[cols].sort_values(cols).reset_index(drop=True)
    es = exp[cols].sort_values(cols).reset_index(drop=True)
    assert gs.shape == es.shape
    assert (gs.astype(str).values == es.astype(str).values).all()


def test_modularity_identities():
    """Per component (CC partition): handshake sum_deg = 2*n_edges;
    labels are component minima (label <= any endpoint it owns is
    implied by label being the min node id: label appears as its own
    component's smallest node)."""
    got = W.QUERIES["modularity_parts"](SF).to_pandas()
    assert len(got) > 0
    assert (got["sum_deg"] == 2 * got["n_edges"]).all()
    assert got["label"].is_unique
    assert (got["n_edges"] >= 1).all()
