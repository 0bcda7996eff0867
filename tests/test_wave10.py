"""Wave-10 checks: SCD2 interval invariants + oracle, slope gradient
oracle + wrap behavior, compress_ratio vs direct zlib."""
import zlib

import numpy as np
import pandas as pd

from oluray.pipelines import queries_wave10 as W

SF = "/root/testdata/sf0.001"


def _oracle_df(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ("events", "documents"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    return con.sql(sql).df()


def test_scd2_oracle_exact():
    got = W.QUERIES["scd2_history"](SF).to_pandas()
    exp = _oracle_df(W.ORACLE["scd2_history"])
    cols = sorted(got.columns)
    gs = got[cols].sort_values(cols).reset_index(drop=True)
    es = exp[cols].sort_values(cols).reset_index(drop=True)
    assert gs.shape == es.shape
    assert (gs.astype(str).values == es.astype(str).values).all()


def test_scd2_interval_invariants():
    got = W.QUERIES["scd2_history"](SF).to_pandas()
    assert len(got) > 0
    for uid, g in got.groupby("user_id"):
        g = g.sort_values("valid_from_us").reset_index(drop=True)
        # exactly one open interval per user, and it is the last
        open_rows = g["valid_to_us"] == -1
        assert open_rows.sum() == 1
        assert bool(open_rows.iloc[-1])
        # closed intervals chain: valid_to == next valid_from
        closed = g.iloc[:-1]
        if len(closed):
            assert (closed["valid_to_us"].to_numpy()
                    == g["valid_from_us"].to_numpy()[1:]).all()
        # consecutive states differ (it records CHANGES)
        types = g["event_type"].to_numpy()
        assert (types[1:] != types[:-1]).all()


def test_slope_oracle_exact():
    got = W.QUERIES["slope_aspect"](SF).to_pandas()
    exp = _oracle_df(W.ORACLE["slope_aspect"])
    cols = sorted(got.columns)
    gs = got[cols].sort_values(cols).reset_index(drop=True)
    es = exp[cols].sort_values(cols).reset_index(drop=True)
    assert gs.shape == es.shape
    assert (gs.astype("int64").values == es.astype("int64").values).all()


def test_slope_grad2_consistency():
    got = W.QUERIES["slope_aspect"](SF).to_pandas()
    assert len(got) > 0
    assert (got["grad2"]
            == got["dzdx"] ** 2 + got["dzdy"] ** 2).all()
    # a raster with occupied cells must show some non-zero gradient
    assert (got["grad2"] > 0).any()


def test_compress_ratio_matches_zlib():
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    got = (W.QUERIES["compress_ratio"](SF).to_pandas()
           .set_index("doc_id"))
    assert len(got) == len(docs)
    sample = docs.sample(30, random_state=5)
    for _, r in sample.iterrows():
        raw = r["text"].encode("utf-8")
        cz = len(zlib.compress(raw, 6))
        row = got.loc[int(r["doc_id"])]
        assert int(row["n_raw"]) == len(raw)
        assert int(row["n_zlib"]) == cz
        assert int(row["ratio_e6"]) == cz * 1_000_000 // max(len(raw), 1)
    # repetitive word-soup corpus must compress well below 1.0
    assert got["ratio_e6"].median() < 600_000
