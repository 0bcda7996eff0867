"""Skew helpers, PSNR verifier stage, kNN fallback path."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from oluray.functions import geo
from oluray.sources import fixtures
from oluray.stages import skew, spatial
from oluray.stages.image import VerifyPsnr


def test_preagg_cell_counts_matches_plain_groupby():
    rng = np.random.default_rng(3)
    cells = rng.integers(0, 50, 5000)
    ds = ray.data.from_arrow(pa.table({"cell": pa.array(cells, pa.int64())}))
    got = (
        skew.preagg_cell_counts(ds, "cell").to_pandas()
        .sort_values("cell").reset_index(drop=True)
    )
    exp = (
        pd.Series(cells).value_counts().rename_axis("cell").reset_index(name="n")
        .sort_values("cell").reset_index(drop=True)
    )
    assert got["cell"].tolist() == exp["cell"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()


def test_salted_deterministic_and_bounded():
    ds = ray.data.from_arrow(pa.table({"id": pa.array(np.arange(1000), pa.int64())}))
    a = skew.salted(ds, "id", buckets=8).to_pandas()
    b = skew.salted(ds, "id", buckets=8).to_pandas()
    assert (a.sort_values("id")["salt"].to_numpy()
            == b.sort_values("id")["salt"].to_numpy()).all()  # deterministic
    assert a["salt"].between(0, 7).all()
    assert a["salt"].nunique() > 1  # actually spreads


def test_salted_group_apply_splits_hot_key():
    # one hot key, decomposable partial count per (key, salt)
    rows = pa.table({
        "cell": pa.array([7] * 900 + [1, 2, 3] * 30, pa.int64()),
        "id": pa.array(np.arange(990), pa.int64()),
    })
    ds = ray.data.from_arrow(rows)

    def partial_count(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"cell": [g["cell"].iloc[0]], "n": [len(g)]})

    out = skew.salted_group_apply(ds, "cell", partial_count, buckets=4, id_col="id")
    df = out.to_pandas()
    merged = df.groupby("cell")["n"].sum()
    assert merged[7] == 900
    assert (df[df["cell"] == 7].shape[0]) > 1  # hot key actually split


def test_verify_psnr_stage():
    imgs = fixtures.make_images(8, seed=5)
    # bytes_ref = identical copy -> all rows pass
    t = imgs.append_column("bytes_ref", imgs["bytes"])
    out = VerifyPsnr(40.0)(t)
    assert out["pixels_ok"].to_pylist() == [True] * 8
    # corrupt one png's pixels: re-encode different content
    from oluray.functions.imagecodec import encode

    px = fixtures._pixels(0, 32, 32, 5)
    other = encode(255 - px, imgs["fmt"][0].as_py())
    blobs = imgs["bytes"].to_pylist()
    blobs[0] = other
    t2 = imgs.set_column(1, "bytes", pa.array(blobs, pa.binary())).append_column(
        "bytes_ref", imgs["bytes"]
    )
    out2 = VerifyPsnr(40.0)(t2)
    assert out2["pixels_ok"].to_pylist()[0] is False
    assert all(out2["pixels_ok"].to_pylist()[1:])


def test_knn_fallback_path_res_gt8_matches_brute():
    # res > 8 disables the precomputed CSR -> exercises the iterative
    # ring-expansion path end-to-end
    rng = np.random.default_rng(9)
    nf = 200
    fid = np.arange(nf, dtype=np.int64)
    flon = np.round(rng.uniform(-179, 179, nf), 7)
    flat_ = np.round(rng.uniform(-84, 84, nf), 7)
    pts = pa.table(
        {
            "image_id": [f"p{i}" for i in range(400)],
            "lon": np.round(rng.uniform(-179, 179, 400), 7),
            "lat": np.round(rng.uniform(-84, 84, 400), 7),
        }
    )
    got = (
        spatial.knn_join(ray.data.from_arrow(pts), fid, flon, flat_, k=1, res=9)
        .to_pandas().set_index("image_id")
    )
    bi, _ = spatial.knn_brute(pts["lon"].to_numpy(), pts["lat"].to_numpy(), flon, flat_, 1)
    ids = pts["image_id"].to_pylist()
    for i, pid in enumerate(ids):
        assert got.loc[pid, "feature_id"] == fid[bi[i, 0]]


def test_verify_psnr_lossless_requires_exact():
    """A subtly corrupted PNG (high PSNR but not byte-identical
    pixels) must FAIL the lossless check."""
    import pyarrow as pa
    import ray.data

    from oluray.functions.imagecodec import decode_png, encode_png
    from oluray.sources import fixtures
    from oluray.stages.image import VerifyPsnr

    px = fixtures._pixels(3, 16, 16, 42)
    px2 = px.copy()
    px2[0, 0, 0] ^= 1  # one-bit corruption: PSNR ~ huge, still wrong
    ds = ray.data.from_arrow(
        pa.table(
            {"image_id": pa.array(["i1"]),
             "bytes": pa.array([encode_png(px2)], pa.binary()),
             "bytes_ref": pa.array([encode_png(px)], pa.binary()),
             "fmt": pa.array(["png"])}
        )
    )
    out = ds.map_batches(VerifyPsnr, batch_format="pyarrow", concurrency=1).to_pandas()
    assert not out["pixels_ok"].iloc[0]
    assert out["psnr_db"].iloc[0] >= 40.0


def test_salted_string_ids_deterministic():
    import pyarrow as pa
    import ray.data

    from oluray.stages import skew

    t = pa.table({"k": pa.array(["x", "y", "x", "z"])})
    a = skew.salted(ray.data.from_arrow(t), "k", buckets=8).to_pandas()
    b = skew.salted(ray.data.from_arrow(t), "k", buckets=8).to_pandas()
    assert (a["salt"] == b["salt"]).all()
    assert a["salt"].iloc[0] == a["salt"].iloc[2]  # same id, same salt


def test_auto_salted_group_apply_splits_only_hot_keys():
    import ray.data as rd

    from oluray.stages import skew

    rng = np.random.default_rng(13)
    # key 1 is hot (10k rows), keys 100..149 are cold (~40 rows each)
    keys = np.concatenate([
        np.full(10_000, 1, dtype=np.int64),
        rng.integers(100, 150, 2_000).astype(np.int64),
    ])
    df = pd.DataFrame({"key": keys, "id": np.arange(len(keys), dtype=np.int64)})
    parts = np.array_split(df.sample(frac=1.0, random_state=0), 6)
    ds = rd.from_pandas([p.reset_index(drop=True) for p in parts])

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"key": [g["key"].iloc[0]],
                             "salt": [g["salt"].iloc[0]],
                             "n": [len(g)]})

    out = skew.auto_salted_group_apply(
        ds, "key", per_group, buckets=8, id_col="id", top=1, per_block=4,
    ).to_pandas()
    # hot key split across >1 sub-groups, cold keys exactly 1 each
    assert out[out["key"] == 1]["salt"].nunique() > 1
    cold = out[out["key"] != 1]
    assert (cold.groupby("key")["salt"].nunique() == 1).all()
    assert (cold["salt"] == 0).all()
    # merged partials reproduce the exact counts
    merged = out.groupby("key")["n"].sum()
    exact = df["key"].value_counts()
    assert merged.loc[1] == 10_000
    assert (merged.sort_index() == exact.sort_index()).all()
