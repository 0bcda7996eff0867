"""Wave-20 checks: Spearman vs oracle + scipy-free brute rho,
Benford vs oracle + total-count identity, PAVA vs an independent
O(n^2) pooler + monotonicity/partition invariants."""
import numpy as np
import pandas as pd

from oluray.pipelines import queries_wave20 as W

SF = "/root/testdata/sf0.001"


def _oracle_df(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ("events", "orders", "documents"):
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


def test_spearman_oracle_exact():
    got = W.QUERIES["spearman_corr"](SF).to_pandas()
    assert len(got) == 5
    _assert_equal(got, _oracle_df(W.ORACLE["spearman_corr"]))


def test_spearman_brute():
    """rho_1e9 matches a from-scratch tie-averaged-rank Pearson on
    the raw rows (float path, tolerance 1 ulp of the 1e9 scale)."""
    import pyarrow.parquet as pq

    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts", "value"]).to_pandas()
    got = W.QUERIES["spearman_corr"](SF).to_pandas() \
        .set_index("event_type")
    for et, sub in df.groupby("event_type"):
        rx = sub["ts"].rank(method="average").to_numpy()
        ry = sub["value"].rank(method="average").to_numpy()
        rho = np.corrcoef(rx, ry)[0, 1]
        assert abs(int(got.loc[et, "rho_1e9"]) - rho * 1e9) <= 2
        assert int(got.loc[et, "n"]) == len(sub)


def test_benford_oracle_exact():
    got = W.QUERIES["benford_digits"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["benford_digits"]))


def test_benford_total():
    import pyarrow.parquet as pq

    n = pq.read_metadata(f"{SF}/orders.parquet").num_rows
    got = W.QUERIES["benford_digits"](SF).to_pandas()
    assert int(got["cnt"].sum()) == n
    assert got["digit"].between(1, 9).all()


def _pava_brute(sc, pos, cnt):
    """Independent O(n^2) PAVA: repeatedly merge the first adjacent
    violator until monotone."""
    blocks = [[int(s), int(s), int(p), int(c)]
              for s, p, c in zip(sc, pos, cnt)]
    changed = True
    while changed:
        changed = False
        for i in range(len(blocks) - 1):
            a, b = blocks[i], blocks[i + 1]
            if a[2] * b[3] > b[2] * a[3]:
                blocks[i:i + 2] = [[a[0], b[1], a[2] + b[2],
                                    a[3] + b[3]]]
                changed = True
                break
    return [tuple(b) for b in blocks]


def test_pava_kernel_vs_brute():
    rng = np.random.default_rng(7)
    for _ in range(25):
        k = int(rng.integers(1, 30))
        sc = np.sort(rng.choice(1000, size=k, replace=False))
        cnt = rng.integers(1, 6, size=k)
        pos = np.array([rng.integers(0, c + 1) for c in cnt])
        assert W._pava(sc, pos, cnt) == _pava_brute(sc, pos, cnt)


def test_isotonic_real_input():
    """Engine blocks: per lang, rates non-decreasing, scores
    partitioned, totals conserved, and equal to the brute pooler run
    on the aggregated rows."""
    import pyarrow.parquet as pq

    got = W.QUERIES["isotonic_calib"](SF).to_pandas()
    df = pq.read_table(f"{SF}/documents.parquet",
                       columns=["lang", "source", "n_chars"]).to_pandas()
    df["pos"] = df["source"].isin(W.ISO_POS_SOURCES).astype(int)
    for lang, sub in got.groupby("lang"):
        sub = sub.sort_values("sc_lo")
        # partition: lo <= hi, next lo > prev hi
        assert (sub["sc_lo"] <= sub["sc_hi"]).all()
        assert (sub["sc_lo"].to_numpy()[1:]
                > sub["sc_hi"].to_numpy()[:-1]).all()
        # monotone non-decreasing rates (cross-multiplied)
        p = sub["pos_sum"].to_numpy(np.int64)
        n = sub["n"].to_numpy(np.int64)
        assert (p[:-1] * n[1:] <= p[1:] * n[:-1]).all()
        raw = df[df["lang"] == lang]
        assert int(n.sum()) == len(raw)
        assert int(p.sum()) == int(raw["pos"].sum())
        agg = raw.groupby("n_chars")["pos"].agg(["sum", "size"]) \
            .reset_index().sort_values("n_chars")
        exp = _pava_brute(agg["n_chars"].to_numpy(),
                          agg["sum"].to_numpy(),
                          agg["size"].to_numpy())
        act = list(zip(sub["sc_lo"].astype(int), sub["sc_hi"].astype(int),
                       sub["pos_sum"].astype(int), sub["n"].astype(int)))
        assert act == exp
