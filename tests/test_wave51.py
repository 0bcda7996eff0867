"""Wave-51 checks: kNN purity vs oracle + brute numpy recompute."""
import numpy as np
import pandas as pd

from oluray.pipelines import queries_wave51 as W

SF = "/root/testdata/sf0.001"


def test_purity_oracle_exact():
    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{SF}/embeddings.parquet')")
    got = W.QUERIES["knn_purity"](SF).to_pandas()
    exp = con.sql(W.ORACLE["knn_purity"]).df()
    cols = sorted(got.columns)
    assert sorted(exp.columns) == cols
    gs = got[cols].sort_values(cols).reset_index(drop=True)
    es = exp[cols].sort_values(cols).reset_index(drop=True)
    assert gs.shape == es.shape
    assert (gs.astype(str).values == es.astype(str).values).all()


def test_purity_brute():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    M = np.stack(t["embedding"].to_numpy())
    norm = M / np.linalg.norm(M, axis=1, keepdims=True)
    ids = t["vec_id"].to_numpy(np.int64)
    labels = t["label"].to_numpy(np.int64)
    pos = {int(v): i for i, v in enumerate(ids)}
    got = W.QUERIES["knn_purity"](SF).to_pandas().set_index("label")
    expect = {}
    for qi, v in enumerate(ids):
        if v % W.PURITY_MOD:
            continue
        sims = norm @ norm[pos[int(v)]]
        # best non-self: sim desc, vec_id asc
        order = sorted(range(len(ids)),
                       key=lambda i: (-sims[i], ids[i]))
        best = next(i for i in order if ids[i] != v)
        ql = int(labels[pos[int(v)]])
        nq, npure = expect.get(ql, (0, 0))
        expect[ql] = (nq + 1,
                      npure + int(labels[best] == ql))
    for lbl, (nq, npure) in expect.items():
        assert int(got.loc[lbl, "n_queries"]) == nq
        assert int(got.loc[lbl, "n_pure"]) == npure
    assert int(got["n_queries"].sum()) == sum(
        v for v, _ in expect.values())
