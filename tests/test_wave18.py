"""Wave-18 checks: Gi* components vs oracle + hand lattice, grouped
AUC vs oracle + sklearn-free brute AUC, dilation vs oracle +
multiplicity invariants."""
import numpy as np
import pandas as pd

from oluray.functions import geo
from oluray.pipelines import queries_wave18 as W

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


def test_getis_gi_oracle_exact():
    got = W.QUERIES["getis_gi"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["getis_gi"]))


def test_getis_gi_invariants():
    """Structural invariants: w_i in [1, 9] (queen + self, clipped),
    local_sum >= 1 (a cell always counts itself), and gnum is
    internally consistent — the global sum S recovered from one row
    via gnum = n*L - w*S reproduces every other row's gnum."""
    got = W.QUERIES["getis_gi"](SF).to_pandas()
    assert got["w_i"].between(1, 9).all()
    assert (got["local_sum"] >= 1).all()
    n = len(got)
    # gnum = n*L - w*S  =>  recover S from any row: S = (n*L - gnum)/w
    r0 = got.iloc[0]
    s = (n * int(r0["local_sum"]) - int(r0["gnum"])) // int(r0["w_i"])
    recomputed = n * got["local_sum"].astype("int64") - \
        got["w_i"].astype("int64") * s
    assert (recomputed == got["gnum"].astype("int64")).all()


def test_auc_oracle_exact():
    got = W.QUERIES["auc_score"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["auc_score"]))


def test_auc_brute():
    """u2 equals the brute-force pairwise count 2*#(pos>neg) + #(==)
    computed straight off the parquet rows."""
    import pyarrow.parquet as pq

    df = pq.read_table(f"{SF}/documents.parquet",
                       columns=["lang", "source", "n_chars"]).to_pandas()
    got = W.QUERIES["auc_score"](SF).to_pandas().set_index("lang")
    for lang, sub in df.groupby("lang"):
        pos = sub.loc[sub["source"].isin(W.AUC_POS_SOURCES),
                      "n_chars"].to_numpy()
        neg = sub.loc[~sub["source"].isin(W.AUC_POS_SOURCES),
                      "n_chars"].to_numpy()
        u2 = int(2 * (pos[:, None] > neg[None, :]).sum()
                 + (pos[:, None] == neg[None, :]).sum())
        row = got.loc[lang]
        assert int(row["u2"]) == u2
        assert int(row["n_pos"]) == len(pos)
        assert int(row["n_neg"]) == len(neg)
        # AUC in [0, 1]
        if len(pos) and len(neg):
            assert 0.0 <= u2 / (2 * len(pos) * len(neg)) <= 1.0


def test_dilate_oracle_exact():
    got = W.QUERIES["cell_dilate"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["cell_dilate"]))


def test_dilate_invariants():
    """Dilated set is a superset of the occupied set; multiplicity is
    bounded by 9; total multiplicity == sum over occupied cells of
    their clipped neighborhood size."""
    got = W.QUERIES["cell_dilate"](SF).to_pandas()
    counts = W._event_cell_counts(SF, W.DILATE_RES).to_pandas()
    occ = set(counts["cell"].astype(int))
    dil = set(got["cell"].astype(int))
    assert occ <= dil
    assert got["n_src"].between(1, 9).all()
    n = 1 << W.DILATE_RES
    _, x, y = geo.cell_decode(counts["cell"].to_numpy())
    sizes = ((np.minimum(x + 1, n - 1) - np.maximum(x - 1, 0) + 1)
             * (np.minimum(y + 1, n - 1) - np.maximum(y - 1, 0) + 1))
    assert int(got["n_src"].sum()) == int(sizes.sum())
