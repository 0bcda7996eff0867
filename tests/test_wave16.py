"""Wave-16 checks: Ripley pair counts vs oracle + monotonicity,
quadtree leaves vs an independent recursive reference."""
import numpy as np
import pandas as pd

from oluray.pipelines import queries_wave16 as W

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
    gs = got[cols].sort_values(cols).reset_index(drop=True)
    es = exp[cols].sort_values(cols).reset_index(drop=True)
    assert gs.shape == es.shape
    assert (gs.astype("int64").values == es.astype("int64").values).all()


def test_ripley_oracle_exact():
    got = W.QUERIES["ripley_k"](SF).to_pandas()
    _assert_equal(got, _oracle_df(W.ORACLE["ripley_k"]))


def test_ripley_monotone_and_brute():
    got = W.QUERIES["ripley_k"](SF).to_pandas().sort_values("r_mm")
    # counts are non-decreasing in the radius
    assert got["n_pairs"].is_monotonic_increasing
    # brute-force all-pairs check on the small fixture
    from oluray.functions import geo

    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "event_type"])
    eid = ev.loc[ev["event_type"] == W.RIP_TYPE,
                 "event_id"].to_numpy(np.int64)
    lon, lat = geo.derive_lonlat(eid)
    d = geo.haversine_m(lon[:, None], lat[:, None],
                        lon[None, :], lat[None, :])
    iu = np.triu_indices(len(eid), k=1)
    dmm = np.round(d[iu] * 1000.0).astype(np.int64)
    exp = {r: int((dmm < r).sum()) for r in W.RIP_RADII_MM
           if (dmm < r).sum() > 0}
    act = dict(zip(got["r_mm"].astype(int), got["n_pairs"].astype(int)))
    assert act == exp


def _ref_quadtree(gray: np.ndarray, d, y0, x0, h, w, out):
    blk = gray[y0:y0 + h, x0:x0 + w]
    if (d < W.QT_MAX_DEPTH and min(h, w) > 1
            and int(blk.max() - blk.min()) > W.QT_T):
        h1, w1 = h // 2, w // 2
        _ref_quadtree(gray, d + 1, y0, x0, h1, w1, out)
        _ref_quadtree(gray, d + 1, y0, x0 + w1, h1, w - w1, out)
        _ref_quadtree(gray, d + 1, y0 + h1, x0, h - h1, w1, out)
        _ref_quadtree(gray, d + 1, y0 + h1, x0 + w1, h - h1, w - w1, out)
    else:
        out.append((d, y0, x0, h, w, int(blk.sum()), h * w))


def test_quadtree_reference_and_invariants():
    got = W.QUERIES["quadtree_encode"](SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    from oluray.functions import imagecodec
    from oluray.sources import fixtures

    # leaves tile each image exactly: pixel counts conserve
    per = got.groupby("image_id")[["n_px"]].sum()
    assert len(per) == len(docs)
    for doc_id in docs["doc_id"].iloc[:6]:
        iid = f"img{int(doc_id):08d}"
        wpx = fixtures.SIZES[int(doc_id) % len(fixtures.SIZES)]
        fmt = fixtures.FMTS[int(doc_id) % len(fixtures.FMTS)]
        px = imagecodec.decode(
            imagecodec.encode(fixtures._pixels(int(doc_id), wpx, wpx, 42),
                              fmt), fmt).astype(np.int64)
        gray = px.sum(axis=2)
        exp: list = []
        _ref_quadtree(gray, 0, 0, 0, gray.shape[0], gray.shape[1], exp)
        sub = got[got["image_id"] == iid]
        act = sorted(zip(sub["depth"], sub["y0"], sub["x0"], sub["h"],
                         sub["w"], sub["gray_sum"], sub["n_px"]))
        assert act == sorted(exp)
        assert int(sub["n_px"].sum()) == wpx * wpx
        assert int(sub["gray_sum"].sum()) == int(gray.sum())
