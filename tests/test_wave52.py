"""Wave-52 checks: label radius vs oracle + brute numpy recompute."""
import numpy as np
import pandas as pd

from oluray.pipelines import queries_wave52 as W

SF = "/root/testdata/sf0.001"


def test_radius_oracle_exact():
    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{SF}/embeddings.parquet')")
    got = W.QUERIES["label_radius"](SF).to_pandas()
    exp = con.sql(W.ORACLE["label_radius"]).df()
    cols = sorted(got.columns)
    assert sorted(exp.columns) == cols
    gs = got[cols].sort_values(cols).reset_index(drop=True)
    es = exp[cols].sort_values(cols).reset_index(drop=True)
    assert gs.shape == es.shape
    assert (gs.astype(str).values == es.astype(str).values).all()


def test_radius_brute():
    import pyarrow.parquet as pq

    from oluray.pipelines.queries import _round_half_away

    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    M = np.stack(t["embedding"].to_numpy())
    q = _round_half_away(M.astype(np.float64) * 1e3).astype(object)
    labels = t["label"].to_numpy(np.int64)
    got = W.QUERIES["label_radius"](SF).to_pandas() \
        .set_index("label")
    for lbl in np.unique(labels):
        m = labels == lbl
        n = int(m.sum())
        s = q[m].sum(axis=0)
        d2 = sorted(int(((n * row - s) ** 2).sum()) for row in q[m])
        idx = int(np.floor(W.RQ * (n - 1)))
        assert int(got.loc[int(lbl), "n"]) == n
        assert str(got.loc[int(lbl), "d2_q90"]) == str(d2[idx])
