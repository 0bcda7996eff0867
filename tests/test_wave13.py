"""Wave-13 checks: track rasterization oracle + density invariants,
median-cut palette vs an independent per-image reference."""
import numpy as np
import pandas as pd

from oluray.pipelines import queries_wave13 as W

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
    assert (gs.astype(str).values == es.astype(str).values).all()


def test_track_cells_oracle_exact():
    got = W.QUERIES["track_cells"](SF).to_pandas()
    _assert_equal(got, _oracle_df(W.ORACLE["track_cells"]))


def test_track_cells_sample_conservation():
    # total samples == (#events - #users) * TC_SAMPLES: every
    # consecutive pair contributes exactly TC_SAMPLES cell hits
    got = W.QUERIES["track_cells"](SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    n_seg = len(ev) - ev["user_id"].nunique()
    assert int(got["n_samples"].sum()) == n_seg * W.TC_SAMPLES
    # cells are valid res-6 ids
    from oluray.functions import geo

    n = 1 << W.TC_RES
    base = W.TC_RES * geo.RES_SHIFT
    off = got["cell"].to_numpy(np.int64) - base
    assert (off >= 0).all()
    assert (off % geo.Y_SHIFT < n).all()
    assert (off // geo.Y_SHIFT < n).all()


def _ref_median_cut(px: np.ndarray, levels: int = 2):
    """Independent median-cut reference (same split rule)."""
    boxes = [px.reshape(-1, 3).astype(np.int64)]
    for _ in range(levels):
        nxt = []
        for b in boxes:
            rng = b.max(axis=0) - b.min(axis=0)
            ch = int(np.argmax(rng))
            med = int(np.median(b[:, ch]))
            lo, hi = b[b[:, ch] <= med], b[b[:, ch] > med]
            nxt.extend([b] if len(hi) == 0 else [lo, hi])
        boxes = nxt
    cols = sorted(
        ((len(b), tuple(np.floor(b.mean(axis=0) + 0.5).astype(int)))
         for b in boxes),
        key=lambda c: (-c[0], c[1]))
    return cols


def test_palette_colors_invariants_and_reference():
    got = W.QUERIES["palette_colors"](SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    from oluray.sources import fixtures

    # one palette row per (image, rank<=3); pixel counts conserve
    per = got.groupby("image_id")
    assert (per.size() <= W.PAL_K).all()
    assert len(per) == len(docs)
    assert set(got["rank"]) <= set(range(W.PAL_K))
    for c in ("r", "g", "b"):
        assert got[c].between(0, 255).all()
    sizes = {f"img{int(i):08d}":
             fixtures.SIZES[int(i) % len(fixtures.SIZES)] ** 2
             for i in docs["doc_id"]}
    npx = per["n_pixels"].sum()
    assert all(int(npx[k]) == v for k, v in sizes.items())
    # spot-check 5 images against the independent reference
    from oluray.functions import imagecodec

    for doc_id in docs["doc_id"].iloc[:5]:
        w = fixtures.SIZES[int(doc_id) % len(fixtures.SIZES)]
        fmt = fixtures.FMTS[int(doc_id) % len(fixtures.FMTS)]
        px = imagecodec.decode(
            imagecodec.encode(fixtures._pixels(int(doc_id), w, w, 42),
                              fmt), fmt)
        exp = _ref_median_cut(px)
        sub = got[got["image_id"] == f"img{int(doc_id):08d}"]
        sub = sub.sort_values("rank")
        act = [(int(n), (int(r), int(g), int(b)))
               for n, r, g, b in zip(sub["n_pixels"], sub["r"],
                                     sub["g"], sub["b"])]
        assert act == exp
