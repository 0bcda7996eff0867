"""Wave-54 checks (r5 training-data text ops): PII / URL-dedup /
repetition catalog queries vs their DuckDB oracles at sf0.001, plus
brute-force invariants the gate can't see."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from oluray.pipelines.queries import ORACLE, QUERIES

SF = "/root/testdata/sf0.001"
NAMES = ("pii_stats", "pii_redact", "url_dedup", "doc_repetition",
         "ttl_emit", "ttl_emit_ways", "ttl_emit_rels")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "customer", "orders", "lineitem"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity(ray_session, con, name):
    got = QUERIES[name](SF).to_pandas()
    exp = con.execute(ORACLE[name]).df()
    cols = sorted(got.columns)
    assert cols == sorted(exp.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    e = exp[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        if g[c].dtype != e[c].dtype:
            g[c] = g[c].astype(e[c].dtype)
    pd.testing.assert_frame_equal(g, e, check_like=True)


def test_repetition_bounds(ray_session):
    got = QUERIES["doc_repetition"](SF).to_pandas()
    assert (got["top_word_frac_e6"] <= 1_000_000).all()
    assert (got["distinct_frac_e6"] <= 1_000_000).all()
    nz = got[got["n_words"] > 0]
    assert (nz["top_word_frac_e6"] > 0).all()
    assert (nz["n_distinct"] <= nz["n_words"]).all()


def test_url_dedup_collapses(ray_session):
    got = QUERIES["url_dedup"](SF).to_pandas()
    # noise variants collapsed: fewer canonical urls than docs
    assert got["n_dups"].sum() > len(got)
    assert (got["keep_id"] >= 0).all()
    assert got["canon_url"].is_unique
