"""Wave-24 checks: buffered split vs oracle + rule invariants,
drift components vs oracle + conservation identities."""
import numpy as np
import pandas as pd

from oluray.functions import geo
from oluray.pipelines import queries_wave24 as W

SF = "/root/testdata/sf0.001"


def _oracle_df(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ("events", "orders"):
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


def test_split_oracle_exact():
    got = W.QUERIES["spatial_split"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["spatial_split"]))


def test_split_no_leakage():
    """No train point's block touches a test block: every block
    Chebyshev-adjacent to test is test or buffer."""
    got = W.QUERIES["spatial_split"](SF).to_pandas()
    assert set(got["split"]) <= {"train", "test", "buffer"}
    lon, lat = geo.derive_lonlat(got["event_id"].to_numpy(np.int64))
    c = geo.cell_encode(lon, lat, W.SPLIT_RES)
    rem = c - np.int64(W.SPLIT_RES) * np.int64(geo.RES_SHIFT)
    by, bx = rem // np.int64(geo.Y_SHIFT), rem % np.int64(geo.Y_SHIFT)
    split_of_block = {}
    for x, y, s in zip(bx, by, got["split"]):
        split_of_block.setdefault((int(x), int(y)), set()).add(s)
    # a block maps to exactly one split class
    assert all(len(v) == 1 for v in split_of_block.values())
    for (x, y), s in split_of_block.items():
        if next(iter(s)) == "train":
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    nb = split_of_block.get((x + dx, y + dy))
                    if nb is not None:
                        assert "test" not in nb or (dx == 0 and dy == 0)
    # all three classes occur on real data
    assert {"train", "test", "buffer"} <= set(got["split"])


def test_drift_oracle_exact():
    got = W.QUERIES["spatial_drift"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["spatial_drift"]))


def test_drift_conservation():
    """Counts conserve the two corpus sizes; d sums to zero (the
    contingency identity sum(n_a)*T_b - sum(n_b)*T_a = 0)."""
    import pyarrow.parquet as pq

    got = W.QUERIES["spatial_drift"](SF).to_pandas()
    n_ev = pq.read_metadata(f"{SF}/events.parquet").num_rows
    n_od = pq.read_metadata(f"{SF}/orders.parquet").num_rows
    assert int(got["n_a"].sum()) == n_ev
    assert int(got["n_b"].sum()) == n_od
    assert int(got["d"].astype(object).sum()) == 0
    # per-row identity: d = n_a*T_b - n_b*T_a
    d = (got["n_a"].astype(object) * n_od
         - got["n_b"].astype(object) * n_ev)
    assert (d == got["d"].astype(object)).all()
