"""Brute-force checks for the r3 query-catalog additions that the
DuckDB oracle can't see: z-order locality (the value hash is order-
insensitive) and the rolling-window edge semantics."""
import numpy as np
import pandas as pd

from oluray.functions import geo
from oluray.pipelines import queries as Q

SF = "/root/testdata/sf0.001"


def test_morton_locality_beats_row_order():
    """Sorting cells by morton code yields smaller mean spatial hops
    between neighbours than the raw key order — the whole point of
    the z-order sink layout."""
    got = Q.q_zorder_cells(SF).to_pandas()
    _, x, y = geo.cell_decode(got["cell"].to_numpy())

    def mean_hop(order: np.ndarray) -> float:
        return float(np.mean(np.abs(np.diff(x[order]))
                             + np.abs(np.diff(y[order]))))

    by_key = np.argsort(got["c_custkey"].to_numpy(), kind="stable")
    by_morton = np.argsort(got["morton"].to_numpy(), kind="stable")
    assert mean_hop(by_morton) < 0.5 * mean_hop(by_key)


def test_morton_roundtrip_bit_interleave():
    rng = np.random.default_rng(11)
    res = 12
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-90, 90, 200)
    cells = geo.cell_encode(lon, lat, res)
    m = geo.morton_code(cells)
    _, x, y = geo.cell_decode(cells)
    # de-interleave and compare
    xx = np.zeros_like(x)
    yy = np.zeros_like(y)
    for i in range(res):
        xx |= ((m >> (2 * i)) & 1) << i
        yy |= ((m >> (2 * i + 1)) & 1) << i
    assert np.array_equal(xx, x) and np.array_equal(yy, y)


def test_rolling_24h_peer_and_boundary_semantics():
    """RANGE-frame semantics vs an O(n^2) oracle: equal-ts peers all
    included (even 'later' ones), the -24h boundary inclusive."""
    ts = pd.to_datetime([
        "2024-01-01 00:00:00.000000", "2024-01-01 12:00:00.000000",
        "2024-01-02 00:00:00.000000",       # exactly 24h after row 0
        "2024-01-02 00:00:00.000000",       # peer of row 2
        "2024-01-03 00:00:00.000001",       # just outside 24h of row 2
    ], format="%Y-%m-%d %H:%M:%S.%f")
    df = pd.DataFrame({
        "event_id": np.arange(5, dtype=np.int64),
        "user_id": np.int64(7),
        "ts": ts.astype("datetime64[us]"),
        "value": [1.0, 2.0, 4.0, 8.0, 16.0],
    })
    # run the real query over a one-table scratch sf_dir
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp()
    pq.write_table(pa.Table.from_pandas(df), os.path.join(d, "events.parquet"))
    got = (
        Q.q_rolling_24h(d).to_pandas()
        .sort_values("event_id").reset_index(drop=True)
    )
    W = pd.Timedelta(hours=24)
    exp_n, exp_sum = [], []
    cents = np.round(df["value"].to_numpy() * 100).astype(np.int64)
    for i in range(len(df)):
        m = (df["ts"] >= df["ts"][i] - W) & (df["ts"] <= df["ts"][i])
        exp_n.append(int(m.sum()))
        exp_sum.append(int(cents[m.to_numpy()].sum()))
    assert got["w_n"].tolist() == exp_n
    assert got["w_sum_cents"].tolist() == exp_sum
    # the peer rows (2,3) must have identical windows incl. each other
    assert got.loc[2, "w_n"] == got.loc[3, "w_n"] == 4


def test_cell_pyramid_levels_consistent():
    got = Q.q_cell_pyramid(SF).to_pandas()
    res, _, _ = geo.cell_decode(got["cell"].to_numpy())
    got["res"] = res
    totals = got.groupby("res")["n"].sum()
    # every zoom level accounts for every point exactly once
    assert totals.nunique() == 1
    lv12 = got[got["res"] == 12]
    lv8 = got[got["res"] == 8].set_index("cell")["n"]
    roll = (
        pd.Series(lv12["n"].to_numpy(),
                  index=geo.cell_parent(lv12["cell"].to_numpy(), 8))
        .groupby(level=0).sum()
    )
    pd.testing.assert_series_equal(
        roll.sort_index(), lv8.sort_index(), check_names=False
    )


def _scratch_sf(**tables) -> str:
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp()
    for name, df in tables.items():
        pq.write_table(pa.Table.from_pandas(df), os.path.join(d, f"{name}.parquet"))
    return d


def test_running_total_negative_values_sign_safe():
    """The per-segment base subtraction must not assume the running
    sum is monotone (negative values break a max-accumulate-on-csum
    shortcut)."""
    df = pd.DataFrame({
        "event_id": np.arange(6, dtype=np.int64),
        "user_id": np.array([1, 1, 1, 2, 2, 2], dtype=np.int64),
        "ts": pd.date_range("2024-01-01", periods=6, freq="1h")
                .astype("datetime64[us]"),
        "value": [-5.0, 3.0, -1.0, 10.0, -20.0, 4.0],
    })
    got = (
        Q.q_running_total(_scratch_sf(events=df)).to_pandas()
        .sort_values("event_id").reset_index(drop=True)
    )
    assert got["run_cents"].tolist() == [-500, -200, -300, 1000, -1000, -600]


def test_cust_event_counts_left_join_zero_fill():
    cust = pd.DataFrame({"c_custkey": np.arange(5, dtype=np.int64)})
    ev = pd.DataFrame({
        "user_id": np.array([0, 0, 3], dtype=np.int64),
        "event_id": np.arange(3, dtype=np.int64),
        "value": [1.0, 2.0, 4.0],
    })
    got = (
        Q.q_cust_event_counts(_scratch_sf(customer=cust, events=ev))
        .to_pandas().sort_values("c_custkey").reset_index(drop=True)
    )
    assert got["n_events"].tolist() == [2, 0, 0, 1, 0]
    assert got["sum_cents"].tolist() == [300, 0, 0, 400, 0]
    assert str(got["n_events"].dtype) == "int64"


def test_rolling_24h_many_users_and_fallback_path(monkeypatch):
    """Multi-year spans x many users — the case whose packed key used to
    overflow int64 — plus the forced per-segment fallback branch, both
    against an O(n^2) oracle."""
    rng = np.random.default_rng(11)
    n = 400
    base = pd.Timestamp("2005-01-01").value // 1000  # us
    span = 20 * 365 * 86_400_000_000  # ~20 years in us
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 60, n).astype(np.int64),
        "ts": pd.to_datetime(base + rng.integers(0, span, n), unit="us")
                .astype("datetime64[us]"),
        "value": rng.normal(50, 10, n).round(2),
    })
    d = _scratch_sf(events=df)

    W = pd.Timedelta(hours=24)
    cents = np.round(df["value"].to_numpy() * 100).astype(np.int64)
    exp = []
    for i in range(n):
        m = (
            (df["user_id"] == df["user_id"][i])
            & (df["ts"] >= df["ts"][i] - W) & (df["ts"] <= df["ts"][i])
        ).to_numpy()
        exp.append((int(m.sum()), int(cents[m].sum())))
    exp_n = [e[0] for e in exp]
    exp_s = [e[1] for e in exp]

    got = (Q.q_rolling_24h(d).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    assert got["w_n"].tolist() == exp_n
    assert got["w_sum_cents"].tolist() == exp_s

    # force the exact per-segment loop branch and require identical output
    monkeypatch.setattr(Q, "_ROLL_KEY_LIMIT", 1.0)
    got2 = (Q.q_rolling_24h(d).to_pandas()
            .sort_values("event_id").reset_index(drop=True))
    assert got2["w_n"].tolist() == exp_n
    assert got2["w_sum_cents"].tolist() == exp_s


def test_sales_rollup_levels_consistent():
    got = Q.q_sales_rollup(SF).to_pandas()
    detail = got[(got["l_returnflag"] != "ALL") & (got["l_linestatus"] != "ALL")]
    mid = got[(got["l_returnflag"] != "ALL") & (got["l_linestatus"] == "ALL")]
    total = got[(got["l_returnflag"] == "ALL") & (got["l_linestatus"] == "ALL")]
    assert len(total) == 1
    # every level accounts for every row exactly once
    assert detail["n"].sum() == mid["n"].sum() == total["n"].iloc[0]
    assert detail["sum_qty"].sum() == total["sum_qty"].iloc[0]
    # mid level equals detail rolled up by flag
    roll = detail.groupby("l_returnflag")["n"].sum().sort_index()
    pd.testing.assert_series_equal(
        roll, mid.set_index("l_returnflag")["n"].sort_index(),
        check_names=False,
    )


def test_merge_intervals_islands():
    """Touching windows merge, a >30min gap splits, singleton island
    end = start + 30min — vs hand-computed islands."""
    ts = pd.to_datetime([
        "2024-01-01 00:00", "2024-01-01 00:20",   # overlap -> one island
        "2024-01-01 00:50",                        # touches 00:20+30 -> merges
        "2024-01-01 02:00",                        # gap -> new island
    ]).astype("datetime64[us]")
    df = pd.DataFrame({
        "event_id": np.arange(4, dtype=np.int64),
        "user_id": np.int64(3),
        "ts": ts,
    })
    d = _scratch_sf(events=df)
    got = (Q.q_merge_intervals(d).to_pandas()
           .sort_values("island_start").reset_index(drop=True))
    assert len(got) == 2
    assert got["n_events"].tolist() == [3, 1]
    assert got["island_start"].iloc[0] == ts[0]
    assert got["island_end"].iloc[0] == ts[2] + pd.Timedelta(minutes=30)
    assert got["island_end"].iloc[1] == ts[3] + pd.Timedelta(minutes=30)
