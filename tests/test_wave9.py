"""Wave-9 checks: PPJoin == brute Jaccard, Hilbert curve properties
+ SQL parity, BM25 vs an independent pandas reference, KMV error
bounds, promo-share oracle."""
import numpy as np
import pandas as pd

from oluray.functions import geo
from oluray.pipelines import queries_wave9 as W
from oluray.stages import dedup, sketch

SF = "/root/testdata/sf0.001"


def _oracle_df(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ("documents", "customer", "events", "lineitem", "part"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    return con.sql(sql).df()


def test_ppjoin_equals_brute():
    from oluray.sources.io import read_table

    a = W.QUERIES["jaccard_prefix"](SF).to_pandas()
    docs = read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    b = dedup.ngram_jaccard_pairs(docs, n=6, threshold_e6=150000,
                                  num_partitions=8).to_pandas()
    cols = sorted(a.columns)
    ka = a[cols].sort_values(cols).reset_index(drop=True)
    kb = b[cols].sort_values(cols).reset_index(drop=True)
    assert len(ka) > 0
    pd.testing.assert_frame_equal(ka, kb)


def test_ppjoin_prefix_actually_prunes():
    # the prefix length must be strictly smaller than the doc's gram
    # count for tau > 0 — L = n - ceil(tau*n) + 1 < n whenever
    # ceil(tau*n) >= 2, i.e. for any doc with >= 7 grams at tau=0.15
    for n_grams in (7, 50, 1000):
        lim = n_grams - (150000 * n_grams + 999_999) // 1_000_000 + 1
        assert lim < n_grams
        assert lim >= 1


def test_hilbert_bijection_and_adjacency():
    # bijection + unit-step adjacency on the full order-4 grid is the
    # defining property of a Hilbert traversal
    n = 16
    gx, gy = np.meshgrid(np.arange(n), np.arange(n))
    gx, gy = gx.ravel(), gy.ravel()
    d = geo.hilbert_encode(gx, gy, order=4)
    assert len(set(d.tolist())) == n * n
    assert d.min() == 0 and d.max() == n * n - 1
    idx = np.argsort(d)
    step = np.abs(np.diff(gx[idx])) + np.abs(np.diff(gy[idx]))
    assert (step == 1).all()


def test_hilbert_sql_parity_full_grid():
    import duckdb

    n = 32
    gx, gy = np.meshgrid(np.arange(n), np.arange(n))
    gx, gy = gx.ravel(), gy.ravel()
    d = geo.hilbert_encode(gx, gy, order=5)
    con = duckdb.connect()
    con.register("customer", pd.DataFrame(
        {"c_custkey": np.arange(len(gx)), "gx": gx, "gy": gy}))
    out = con.sql(geo.hilbert_encode_sql("gx", "gy", order=5)).df()
    out = out.sort_values("c_custkey")
    assert (out["hd"].to_numpy() == d).all()


def test_hilbert_cells_oracle_exact():
    got = W.QUERIES["hilbert_cells"](SF).to_pandas()
    exp = _oracle_df(W.ORACLE["hilbert_cells"])
    cols = sorted(got.columns)
    gs = got[cols].sort_values(cols).reset_index(drop=True)
    es = exp[cols].sort_values(cols).reset_index(drop=True)
    assert gs.shape == es.shape
    assert (gs.astype("int64").values == es.astype("int64").values).all()


def test_bm25_matches_pandas_reference():
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    # independent reference implementation
    toks = (docs.assign(term=docs["text"].str.lower()
                        .str.split(r"[^a-z]+", regex=True))
            .explode("term"))
    toks = toks[toks["term"].notna() & (toks["term"] != "")]
    dl = toks.groupby("doc_id").size()
    n_docs = len(dl)
    avgdl = float(dl.sum()) / n_docs
    scores = pd.Series(0.0, index=dl.index)
    for t in W.BM25_TERMS:
        tf = toks[toks["term"] == t].groupby("doc_id").size()
        dft = int((tf > 0).sum())
        idf = float(np.log((n_docs - dft + 0.5) / (dft + 0.5) + 1.0))
        w = (tf * (W.BM25_K1 + 1.0)
             / (tf + W.BM25_K1 * (1.0 - W.BM25_B
                                  + W.BM25_B * dl.loc[tf.index] / avgdl)))
        scores = scores.add(idf * w, fill_value=0.0)
    pos = scores[scores > 0].reset_index()
    pos.columns = ["doc_id", "s"]
    want = pos.sort_values(["s", "doc_id"],
                           ascending=[False, True]).head(20)

    got = W.QUERIES["bm25_topk"](SF).to_pandas()
    assert len(got) == len(want)
    g = got.set_index("doc_id")["bm25"]
    for did, s in zip(want["doc_id"], want["s"]):
        assert abs(g.loc[did] - s) < 1e-9


def test_kmv_estimate_error_bound():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 50_000, 150_000)
    import ray.data

    ds = ray.data.from_pandas(pd.DataFrame({"k": vals}))
    m = sketch.kmv_minima(ds, "k", 256)
    est = sketch.kmv_estimate(m, 256)
    exact = len(np.unique(vals))
    # std err ~ 1/sqrt(k-2) ~ 6.3%; allow 4 sigma
    assert abs(est - exact) / exact < 0.25


def test_kmv_small_set_is_exact():
    import ray.data

    ds = ray.data.from_pandas(pd.DataFrame({"k": np.arange(100)}))
    m = sketch.kmv_minima(ds, "k", 256)
    assert sketch.kmv_estimate(m, 256) == 100.0


def test_kmv_distinct_query_vs_exact():
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_type"])
    a = set(ev.loc[ev["event_type"] == "click", "user_id"])
    b = set(ev.loc[ev["event_type"] == "purchase", "user_id"])
    got = W.QUERIES["kmv_distinct"](SF).iloc[0]
    # tiny cardinalities -> sketch holds the exact sets
    assert int(got["n_clickers"]) == len(a)
    assert int(got["n_purchasers"]) == len(b)
    assert int(got["n_intersect_est"]) == len(a & b)


def test_promo_share_oracle_exact():
    got = W.QUERIES["promo_share"](SF)
    exp = _oracle_df(W.ORACLE["promo_share"])
    assert int(got["promo_cents"].iloc[0]) == int(exp["promo_cents"].iloc[0])
    assert int(got["total_cents"].iloc[0]) == int(exp["total_cents"].iloc[0])
    assert (int(got["promo_share_bp"].iloc[0])
            == int(exp["promo_share_bp"].iloc[0]))
    assert 0 < int(got["promo_share_bp"].iloc[0]) < 10000
