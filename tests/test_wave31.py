"""Wave-31 checks: PSI buckets vs oracle + conservation, percolation
vs brute flood fill per threshold, segmentation DP vs exhaustive
two-breakpoint search."""
import numpy as np
import pandas as pd

from oluray.functions import geo
from oluray.pipelines import queries_wave31 as W

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
    assert sorted(exp.columns) == cols
    gs = got[cols].sort_values(cols).reset_index(drop=True)
    es = exp[cols].sort_values(cols).reset_index(drop=True)
    assert gs.shape == es.shape
    assert (gs.astype(str).values == es.astype(str).values).all()


def test_psi_oracle_exact():
    got = W.QUERIES["psi_buckets"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["psi_buckets"]))


def test_psi_conservation():
    import pyarrow.parquet as pq

    got = W.QUERIES["psi_buckets"](SF).to_pandas()
    n = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert int(got["n_a"].sum() + got["n_b"].sum()) == n
    assert got["bucket"].between(0, W.PSI_DECILES).all()
    # deciles: each bucket holds roughly a tenth of the corpus
    # (ties can skew, but no bucket may dominate)
    tot = got["n_a"] + got["n_b"]
    assert tot.max() <= n // 2


def test_percolation_brute():
    from oluray.pipelines.queries_wave18 import _event_cell_counts
    from tests.test_wave29 import _flood_count

    counts = _event_cell_counts(SF, W.PERC_RES).to_pandas()
    got = W.QUERIES["percolation_sweep"](SF).to_pandas() \
        .set_index("k")
    n_grid = 1 << W.PERC_RES
    cnt = np.zeros((n_grid, n_grid), dtype=np.int64)
    _, x, y = geo.cell_decode(counts["cell"].to_numpy(np.int64))
    cnt[y, x] = counts["v"].to_numpy(np.int64)
    for k in W.PERC_KS:
        mask = cnt >= k
        assert int(got.loc[k, "n_cells"]) == int(mask.sum())
        assert int(got.loc[k, "n_components"]) == _flood_count(mask)
    # monotone: higher threshold, fewer active cells
    assert (np.diff(got["n_cells"].to_numpy()) <= 0).all()


def test_segment_dp_brute():
    """DP equals the exhaustive two-breakpoint minimum on random
    series (same float SSE formula)."""
    rng = np.random.default_rng(5)
    for _ in range(8):
        n = int(rng.integers(W.SEG_K, 25))
        c = rng.integers(0, 50, n).astype(np.int64)
        days = np.arange(100, 100 + n, dtype=np.int64)
        segs = W._segment_dp(days, c)
        assert len(segs) == W.SEG_K

        def sse(a, b):
            x = c[a:b].astype(np.float64)
            return float(((x - x.mean()) ** 2).sum())

        best = None
        for i in range(1, n - 1):
            for j in range(i + 1, n):
                v = sse(0, i) + sse(i, j) + sse(j, n)
                if best is None or v < best[0] - 1e-9:
                    best = (v, i, j)
        got_total = 0.0
        pos = 0
        for (lo, hi, nd, s) in segs:
            got_total += sse(pos, pos + nd)
            pos += nd
        assert abs(got_total - best[0]) < 1e-6
        # conservation
        assert sum(s[2] for s in segs) == n
        assert sum(s[3] for s in segs) == int(c.sum())


def test_segment_real_invariants():
    got = W.QUERIES["segment_series"](SF).to_pandas() \
        .sort_values("seg")
    assert list(got["seg"]) == [1, 2, 3]
    assert (got["day_lo"] <= got["day_hi"]).all()
    # contiguous, ordered segments
    assert (got["day_lo"].to_numpy()[1:]
            > got["day_hi"].to_numpy()[:-1]).all()
