"""Wave-29 checks: rich club vs oracle + monotonicity, blob count
vs an independent flood fill + hand masks."""
import numpy as np
import pandas as pd

from oluray.pipelines import queries_wave29 as W

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


def test_rich_club_oracle_exact():
    got = W.QUERIES["rich_club"](SF)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    assert len(got) == len(W.RC_KS)
    _assert_equal(got, _oracle_df(W.ORACLE["rich_club"]))


def test_rich_club_monotone():
    """Both counts non-increasing in k; edges bounded by the clique
    count of the surviving nodes."""
    got = W.QUERIES["rich_club"](SF)
    got = (got.to_pandas() if hasattr(got, "to_pandas")
           else got).sort_values("k")
    n = got["n_nodes"].to_numpy(np.int64)
    e = got["n_edges"].to_numpy(np.int64)
    assert (np.diff(n) <= 0).all() and (np.diff(e) <= 0).all()
    assert (2 * e <= n * np.maximum(n - 1, 0)).all()


def _flood_count(mask: np.ndarray) -> int:
    """Independent BFS flood fill."""
    h, w = mask.shape
    seen = np.zeros_like(mask, dtype=bool)
    cnt = 0
    for sy in range(h):
        for sx in range(w):
            if mask[sy, sx] and not seen[sy, sx]:
                cnt += 1
                stack = [(sy, sx)]
                seen[sy, sx] = True
                while stack:
                    y, x = stack.pop()
                    for ny, nx in ((y + 1, x), (y - 1, x),
                                   (y, x + 1), (y, x - 1)):
                        if 0 <= ny < h and 0 <= nx < w and \
                                mask[ny, nx] and not seen[ny, nx]:
                            seen[ny, nx] = True
                            stack.append((ny, nx))
    return cnt


def test_label_components_hand():
    m = np.array([[1, 0, 1],
                  [1, 0, 0],
                  [0, 0, 1]], dtype=bool)
    assert W.label_components(m) == 3
    assert W.label_components(np.zeros((3, 3), dtype=bool)) == 0
    assert W.label_components(np.ones((2, 2), dtype=bool)) == 1
    # diagonal does NOT connect (4-connectivity)
    d = np.eye(4, dtype=bool)
    assert W.label_components(d) == 4


def test_label_components_random_vs_flood():
    rng = np.random.default_rng(3)
    for _ in range(20):
        m = rng.random((rng.integers(2, 20), rng.integers(2, 20))) < .4
        assert W.label_components(m) == _flood_count(m)


def test_blob_count_real_brute():
    from oluray.functions import imagecodec
    from oluray.sources import fixtures

    got = W.QUERIES["image_blob_count"](SF).to_pandas()
    assert len(got) > 0
    for r in got.sort_values("image_id").head(8).itertuples():
        i = int(r.image_id[3:])
        w = h = fixtures.SIZES[i % len(fixtures.SIZES)]
        fmt = fixtures.FMTS[i % len(fixtures.FMTS)]
        gray = imagecodec.decode(
            imagecodec.encode(fixtures._pixels(i, w, h, 42), fmt),
            fmt).astype(np.int64).sum(axis=2)
        mask = 2 * gray * gray.size > 3 * int(gray.sum())
        assert int(r.n_bright) == int(mask.sum())
        assert int(r.n_blobs) == _flood_count(mask)
