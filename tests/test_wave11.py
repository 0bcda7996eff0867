"""Wave-11 checks: sparse retrieval vs brute numpy, turn-count
invariants + oracle, KS statistic vs scipy-free reference."""
import numpy as np
import pandas as pd

from oluray.pipelines import queries_wave11 as W

SF = "/root/testdata/sf0.001"


def _oracle_df(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ("documents", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    return con.sql(sql).df()


def _assert_equal(got: pd.DataFrame, exp: pd.DataFrame) -> None:
    cols = sorted(got.columns)
    gs = got[cols].sort_values(cols).reset_index(drop=True)
    es = exp[cols].sort_values(cols).reset_index(drop=True)
    assert gs.shape == es.shape
    assert (gs.astype(str).values == es.astype(str).values).all()


def test_sparse_topk_oracle_exact():
    got = W.QUERIES["sparse_topk"](SF).to_pandas()
    _assert_equal(got, _oracle_df(W.ORACLE["sparse_topk"]))


def test_sparse_topk_vs_brute_numpy():
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    toks = (docs.assign(term=docs["text"].str.lower()
                        .str.split(r"[^a-z]+", regex=True))
            .explode("term"))
    toks = toks[toks["term"].notna() & (toks["term"] != "")]
    tf = toks.groupby(["doc_id", "term"]).size()
    q = tf.loc[W.SPARSE_QDOC]
    qn2 = int((q ** 2).sum())
    rows = []
    for did in docs["doc_id"]:
        if did == W.SPARSE_QDOC:
            continue
        d = tf.loc[did]
        shared = d.index.intersection(q.index)
        dot = int((d.loc[shared] * q.loc[shared]).sum())
        if dot <= 0:
            continue
        n2 = int((d ** 2).sum())
        rows.append((did, dot, dot * dot * 1_000_000_000 // (qn2 * n2)))
    ref = (pd.DataFrame(rows, columns=["doc_id", "dot", "score_e9"])
           .sort_values(["score_e9", "doc_id"],
                        ascending=[False, True]).head(W.SPARSE_K)
           .reset_index(drop=True))
    got = (W.QUERIES["sparse_topk"](SF).to_pandas()
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["doc_id", "dot", "score_e9"]].astype("int64"),
        ref.astype("int64"))


def test_turn_counts_oracle_exact():
    got = W.QUERIES["turn_counts"](SF).to_pandas()
    _assert_equal(got, _oracle_df(W.ORACLE["turn_counts"]))


def test_turn_counts_total_is_triples():
    got = W.QUERIES["turn_counts"](SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    per_user = ev.groupby("user_id").size()
    for _, r in got.iterrows():
        n = int(per_user.loc[int(r["user_id"])])
        assert (int(r["n_left"]) + int(r["n_right"])
                + int(r["n_straight"])) == max(n - 2, 0)


def test_ks_oracle_exact_and_reference():
    got = W.QUERIES["ks_test"](SF)
    exp = _oracle_df(W.ORACLE["ks_test"])
    assert int(got["d_num"].iloc[0]) == int(exp["d_num"].iloc[0])
    assert int(got["d_e6"].iloc[0]) == int(exp["d_e6"].iloc[0])
    # independent reference: direct ECDF max-gap on integer cents
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"])
    a = np.sort(np.round(
        ev.loc[ev["event_type"] == "click", "value"].to_numpy()
        * 100.0).astype(np.int64))
    b = np.sort(np.round(
        ev.loc[ev["event_type"] == "purchase", "value"].to_numpy()
        * 100.0).astype(np.int64))
    grid = np.unique(np.concatenate([a, b]))
    c1 = np.searchsorted(a, grid, side="right")
    c2 = np.searchsorted(b, grid, side="right")
    d_num = int(np.abs(c1 * len(b) - c2 * len(a)).max())
    assert int(got["d_num"].iloc[0]) == d_num
    assert int(got["n1"].iloc[0]) == len(a)
    assert int(got["n2"].iloc[0]) == len(b)
