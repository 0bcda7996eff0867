"""Wave-26 checks: assortativity vs oracle + symmetry identities,
compaction vs oracle + hand quad + cover-partition invariant,
autocorrelation vs oracle + moment identities."""
import numpy as np
import pandas as pd

from oluray.functions import geo
from oluray.pipelines import queries_wave26 as W

SF = "/root/testdata/sf0.001"


def _oracle_df(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ("events",):
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


def test_assortativity_oracle_exact():
    got = W.QUERIES["assortativity"](SF)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    assert len(got) == 1
    _assert_equal(got, _oracle_df(W.ORACLE["assortativity"]))


def test_assortativity_identities():
    """Symmetrized moments: sx == sy, sxx == syy, m even; the
    resulting r lies in [-1, 1]."""
    got = W.QUERIES["assortativity"](SF)
    got = (got.to_pandas() if hasattr(got, "to_pandas") else got).iloc[0]
    m, sx, sy = int(got["m"]), int(got["sx"]), int(got["sy"])
    sxy, sxx, syy = int(got["sxy"]), int(got["sxx"]), int(got["syy"])
    assert sx == sy and sxx == syy and m % 2 == 0
    num = m * sxy - sx * sy
    den = ((m * sxx - sx * sx) * (m * syy - sy * sy)) ** 0.5
    if den > 0:
        assert -1.0 - 1e-12 <= num / den <= 1.0 + 1e-12


def test_compact_oracle_exact():
    got = W.QUERIES["cell_compact"](SF).to_pandas()
    assert len(got) > 0
    _assert_equal(got, _oracle_df(W.ORACLE["cell_compact"]))


def test_compact_hand_quad():
    """A full res-5 quad compacts to its res-4 parent; with one
    sibling missing the three leaves stay; four FULL res-4 parents
    compact again to res 3."""
    base5 = 5 * geo.RES_SHIFT

    def c5(x, y):
        return base5 + y * (1 << 29) + x

    # full quad (0,0)..(1,1) -> parent res4 (0,0); orphan at (10, 10)
    df = pd.DataFrame({"cell": [c5(0, 0), c5(1, 0), c5(0, 1),
                                c5(1, 1), c5(10, 10)]})
    got = W._compact_levels(df)
    rows = set(zip(got["cell"].astype(int), got["res"].astype(int)))
    assert (4 * geo.RES_SHIFT + 0 * (1 << 29) + 0, 4) in rows
    assert (c5(10, 10), 5) in rows
    assert len(rows) == 2
    # 16 leaves = 4 full quads -> res 3 single cell
    cells = [c5(x, y) for x in range(4) for y in range(4)]
    got2 = W._compact_levels(pd.DataFrame({"cell": cells}))
    assert set(zip(got2["cell"].astype(int),
                   got2["res"].astype(int))) == {
        (3 * geo.RES_SHIFT + 0, 3)}


def test_compact_partition():
    """The mixed-res cover partitions the occupied leaf set exactly:
    expanding every output cell back to res-5 leaves (within the
    occupied set) reproduces it with no overlap."""
    from oluray.pipelines.queries_wave18 import _event_cell_counts

    occ = set(_event_cell_counts(SF, W.COMPACT_LEAF_RES)
              .to_pandas()["cell"].astype(int))
    got = W.QUERIES["cell_compact"](SF).to_pandas()
    seen = set()
    for cell, res in zip(got["cell"].astype(int), got["res"].astype(int)):
        rem = cell - res * geo.RES_SHIFT
        y, x = rem // (1 << 29), rem % (1 << 29)
        k = W.COMPACT_LEAF_RES - res
        for dx in range(1 << k):
            for dy in range(1 << k):
                leaf = (W.COMPACT_LEAF_RES * geo.RES_SHIFT
                        + ((y << k) + dy) * (1 << 29) + (x << k) + dx)
                assert leaf in occ          # never covers empty space
                assert leaf not in seen     # no overlap
                seen.add(leaf)
    assert seen == occ                      # full cover


def test_autocorr_oracle_exact():
    got = W.QUERIES["daily_autocorr"](SF).to_pandas()
    assert len(got) == 5
    _assert_equal(got, _oracle_df(W.ORACLE["daily_autocorr"]))


def test_autocorr_identities():
    """Cauchy-Schwarz on the paired sums: dot^2 <= ss0*ss1; all
    sums positive when pairs exist."""
    got = W.QUERIES["daily_autocorr"](SF).to_pandas()
    for r in got.itertuples():
        if int(r.n_days) == 0:
            continue
        assert int(r.dot) ** 2 <= int(r.ss0) * int(r.ss1)
        assert int(r.s0) > 0 and int(r.s1) > 0
