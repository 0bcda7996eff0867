"""Wave-27 checks: kappa vs oracle + brute contingency, z-plan vs
oracle + interval invariants + hand islands, k-fold vs oracle +
stratification balance."""
import numpy as np
import pandas as pd

from oluray.pipelines import queries_wave27 as W

SF = "/root/testdata/sf0.001"


def _oracle_df(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ("events", "documents"):
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


def test_kappa_oracle_exact():
    got = W.QUERIES["cohens_kappa"](SF)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    assert len(got) == 1
    _assert_equal(got, _oracle_df(W.ORACLE["cohens_kappa"]))


def test_kappa_brute():
    """Components recomputed from raw rows with an independent
    LangId pass; kappa lies in [-1, 1]."""
    import pyarrow.parquet as pq

    from oluray.stages import text

    df = pq.read_table(f"{SF}/documents.parquet",
                       columns=["doc_id", "text", "lang"]).to_pandas()
    pred = text.LangId()(df[["doc_id", "text"]])["pred_lang"] \
        .to_numpy()
    t = df["lang"].to_numpy()
    n = len(df)
    agree = int((t == pred).sum())
    labels = set(t) | set(pred)
    cross = sum(int((t == l).sum()) * int((pred == l).sum())
                for l in labels)
    got = W.QUERIES["cohens_kappa"](SF)
    got = (got.to_pandas() if hasattr(got, "to_pandas") else got).iloc[0]
    assert (int(got["n"]), int(got["agree"]), int(got["cross"])) == \
        (n, agree, cross)
    if n * n != cross:
        kappa = (n * agree - cross) / (n * n - cross)
        assert -1.0 <= kappa <= 1.0


def test_zplan_oracle_exact():
    got = W.QUERIES["zrange_plan"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["zrange_plan"]))


def test_zplan_invariants():
    """Intervals are disjoint, sorted, maximal (gap > 1 between
    consecutive), and cell counts match interval widths (consecutive
    z runs)."""
    got = W.QUERIES["zrange_plan"](SF).to_pandas() \
        .sort_values("z_lo").reset_index(drop=True)
    lo = got["z_lo"].to_numpy(np.int64)
    hi = got["z_hi"].to_numpy(np.int64)
    n = got["n_cells"].to_numpy(np.int64)
    assert (hi >= lo).all()
    assert (n == hi - lo + 1).all()         # consecutive runs
    assert (lo[1:] > hi[:-1] + 1).all()     # maximal (a gap between)


def test_z_islands_kernel():
    got = W._z_islands(pd.DataFrame({"z": [5, 3, 4, 9, 10, 20, 4]}))
    assert list(map(tuple, got.to_numpy())) == [
        (3, 5, 3), (9, 10, 2), (20, 20, 1)]


def test_kfold_oracle_exact():
    got = W.QUERIES["stratified_kfold"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["stratified_kfold"]))


def test_kfold_balance():
    """Within every lang, fold sizes differ by at most 1 and every
    doc appears exactly once."""
    import pyarrow.parquet as pq

    got = W.QUERIES["stratified_kfold"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang"]).to_pandas()
    assert got["doc_id"].is_unique and len(got) == len(docs)
    j = got.merge(docs, on="doc_id")
    for lang, sub in j.groupby("lang"):
        sizes = sub.groupby("fold").size()
        assert sizes.max() - sizes.min() <= 1
