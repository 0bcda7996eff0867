"""Wave-43 checks: spherical mean vs oracle + resultant bound,
busiest hour vs oracle + argmax invariants."""
import numpy as np
import pandas as pd

from oluray.pipelines import queries_wave43 as W

SF = "/root/testdata/sf0.001"


def _oracle_df(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')")
    return con.sql(sql).df()


def _assert_equal(got: pd.DataFrame, exp: pd.DataFrame) -> None:
    cols = sorted(got.columns)
    assert sorted(exp.columns) == cols
    gs = got[cols].sort_values(cols).reset_index(drop=True)
    es = exp[cols].sort_values(cols).reset_index(drop=True)
    assert gs.shape == es.shape
    assert (gs.astype(str).values == es.astype(str).values).all()


def test_spherical_oracle_exact():
    got = W.QUERIES["spherical_mean"](SF).to_pandas()
    assert len(got) == 5
    _assert_equal(got, _oracle_df(W.ORACLE["spherical_mean"]))


def test_spherical_resultant_bound():
    """|s| <= n * 1e9 (unit vectors), and the resultant of a spread
    point set is well below 1 (no false concentration)."""
    got = W.QUERIES["spherical_mean"](SF).to_pandas()
    for r in got.itertuples():
        s = np.array([int(r.sx), int(r.sy), int(r.sz)], dtype=float)
        R = float(np.linalg.norm(s)) / (int(r.n) * 1e9)
        assert 0.0 <= R <= 1.0 + 1e-9
        assert R < 0.9  # hashed positions are globally spread


def test_busiest_oracle_exact():
    got = W.QUERIES["busiest_hour"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["busiest_hour"]))


def test_busiest_invariants():
    """One row per occupied cell; hour in 0..23; the winner's count
    is the true per-(cell, hour) max."""
    import duckdb

    from oluray.functions import geo

    lon, lat = geo.derive_lonlat_sql("event_id")
    cell = geo.cell_encode_sql(lon, lat, W.BH_RES)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')")
    per = con.sql(f"""
        SELECT cell, max(n) AS mx FROM (
          SELECT cell, (epoch_us(ts) // {W._HOUR_US}) % 24 AS hour,
                 count(*) AS n
          FROM (SELECT {cell} AS cell, ts FROM events)
          GROUP BY cell, hour) GROUP BY cell""").df() \
        .set_index("cell")
    got = W.QUERIES["busiest_hour"](SF).to_pandas()
    assert got["cell"].is_unique
    assert got["hour"].between(0, 23).all()
    for r in got.itertuples():
        assert int(r.n_events) == int(per.loc[int(r.cell), "mx"])
