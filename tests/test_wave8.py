"""Wave-8 checks: stream-stream interval join vs DuckDB, nonzero-vs-
even-odd winding disagreement on the pentagram, JL distortion bound,
HLL intersection vs exact counts."""
import numpy as np
import pandas as pd

from oluray.pipelines import queries_wave8 as W

SF = "/root/testdata/sf0.001"


def _oracle_df(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ("events", "customer", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    return con.sql(sql).df()


def _assert_frames_equal(got: pd.DataFrame, exp: pd.DataFrame) -> None:
    cols = sorted(got.columns)
    assert cols == sorted(exp.columns)
    gs = got[cols].sort_values(cols).reset_index(drop=True)
    es = exp[cols].sort_values(cols).reset_index(drop=True)
    assert gs.shape == es.shape
    assert (gs.astype(str).values == es.astype(str).values).all()


def test_stream_join_oracle_exact():
    got = W.QUERIES["stream_join"](SF).to_pandas()
    exp = _oracle_df(W.ORACLE["stream_join"])
    assert len(got) > 0
    _assert_frames_equal(got, exp)


def test_stream_join_no_duplicate_pairs():
    # one-sided ghost replication must form each pair exactly once
    got = W.QUERIES["stream_join"](SF).to_pandas()
    assert not got.duplicated(["click_id", "purchase_id"]).any()


def test_pip_winding_oracle_and_rule_disagreement():
    got = W.QUERIES["pip_winding"](SF).to_pandas()
    exp = _oracle_df(W.ORACLE["pip_winding"])
    _assert_frames_equal(got, exp)
    # the pentagram's center pentagon has winding number 2: inside by
    # nonzero, OUTSIDE by even-odd — the query must surface that
    # disagreement region (it's the whole point of the pair)
    center = got[(got["wn"].abs() == 2)]
    assert len(center) > 0
    assert (center["in_nonzero"] == 1).all()
    assert (center["in_evenodd"] == 0).all()
    # and simple-region rows where both rules agree
    agree = got[(got["in_nonzero"] == 1) & (got["in_evenodd"] == 1)]
    assert len(agree) > 0


def test_jl_project_distortion_bound():
    emb = pd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    got = (W.QUERIES["jl_project"](SF).to_pandas()
           .set_index("vec_id")["proj"])
    E = np.vstack([np.asarray(v, float) for v in emb["embedding"]])
    P = np.vstack([np.asarray(got.loc[i], float)
                   for i in emb["vec_id"]])
    assert P.shape == (len(E), W.JL_K)
    rng = np.random.default_rng(7)
    ii = rng.integers(0, len(E), 200)
    jj = rng.integers(0, len(E), 200)
    keep = ii != jj
    do = np.linalg.norm(E[ii[keep]] - E[jj[keep]], axis=1)
    dp = np.linalg.norm(P[ii[keep]] - P[jj[keep]], axis=1)
    ratio = dp / do
    # k=16 is a coarse sketch: per-pair ratios are loose but bounded,
    # and the MEAN squared ratio concentrates near 1 (E[|Px|^2]=|x|^2)
    assert abs(float(np.mean(ratio**2)) - 1.0) < 0.25
    assert ratio.min() > 0.3 and ratio.max() < 2.5


def test_jl_project_deterministic_sign_matrix():
    a = W._jl_signs(64, W.JL_K)
    b = W._jl_signs(64, W.JL_K)
    assert (a == b).all()
    assert set(np.unique(a)) == {-1.0, 1.0}
    # roughly balanced signs (hash quality smoke check)
    assert abs(float(a.mean())) < 0.15


def test_hll_intersect_vs_exact():
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_type"])
    a = set(ev.loc[ev["event_type"] == "click", "user_id"])
    b = set(ev.loc[ev["event_type"] == "purchase", "user_id"])
    got = W.QUERIES["hll_intersect"](SF).iloc[0]
    # p=12 with tiny true cardinalities -> linear counting regime,
    # estimates should be essentially exact here
    assert abs(int(got["n_clickers"]) - len(a)) <= max(1, len(a) // 20)
    assert abs(int(got["n_purchasers"]) - len(b)) <= max(1, len(b) // 20)
    assert abs(int(got["n_union"]) - len(a | b)) <= max(
        1, len(a | b) // 20)
    assert abs(int(got["n_intersect_est"]) - len(a & b)) <= max(
        2, len(a & b) // 10)
