"""Distributed exact quantile selection vs a brute-force sort oracle."""

import numpy as np
import pandas as pd
import ray.data

from oluray.stages.quantiles import group_quantiles_exact

QS = (0.25, 0.5, 0.75)


def _ds(df: pd.DataFrame, blocks: int = 5) -> ray.data.Dataset:
    parts = np.array_split(df.sample(frac=1.0, random_state=0), blocks)
    return ray.data.from_pandas([p.reset_index(drop=True) for p in parts])


def _brute(df: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for k, g in df.groupby("k"):
        v = np.sort(g["v"].to_numpy(np.float64))
        n = len(v)
        for q in QS:
            rows.append((k, q, n, v[int(np.floor(q * (n - 1)))]))
    return pd.DataFrame(rows, columns=["k", "q", "n", "value"])


def _check(df: pd.DataFrame, **kw):
    got = (
        group_quantiles_exact(_ds(df), "k", "v", qs=QS, **kw)
        .sort_values(["k", "q"])
        .reset_index(drop=True)
    )
    exp = _brute(df).sort_values(["k", "q"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_refine_rounds_engage():
    # tiny branch + threshold: needs several refine rounds AND the
    # distributed final collect; values dense with duplicates
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 5000).astype("int64"),
            "v": np.round(rng.normal(0, 100, 5000), 1),
        }
    )
    _check(df, branch=4, collect_threshold=8, num_partitions=4)


def test_duplicate_heavy_groups_snap():
    # one group all-equal (resolved at phase 0), one with two distinct
    # values straddling the median, one normal
    df = pd.DataFrame(
        {
            "k": [0] * 100 + [1] * 101 + [2] * 50,
            "v": [5.0] * 100
            + [1.0] * 60 + [9.0] * 41
            + list(np.linspace(-3, 3, 50)),
        }
    )
    _check(df, branch=4, collect_threshold=2, num_partitions=4)


def test_single_element_and_small_groups():
    df = pd.DataFrame({"k": [0, 1, 1, 2, 2, 2], "v": [3.5, -1.0, 4.0, 9.0, 7.0, 8.0]})
    _check(df, branch=8, collect_threshold=4, num_partitions=4)


def test_straight_collect_path():
    # threshold larger than every group: zero refine rounds, pure
    # distributed collect
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {"k": rng.integers(0, 3, 900).astype("int64"), "v": rng.uniform(-1, 1, 900)}
    )
    _check(df, branch=16, collect_threshold=10**6, num_partitions=4)


def test_empty_input():
    df = pd.DataFrame({"k": pd.Series([], dtype="int64"), "v": pd.Series([], dtype="float64")})
    got = group_quantiles_exact(
        ray.data.from_pandas(df), "k", "v", qs=QS, num_partitions=2
    )
    assert len(got) == 0


def test_nan_values_ignored():
    # NaN rows must not inflate n/rank (SQL NULL semantics): with 3 NaNs
    # and q=0.75 the old count-NaNs phase 0 crashed with an IndexError
    df = pd.DataFrame(
        {"k": ["a"] * 5 + ["b"] * 3,
         "v": [1.0, 2.0, np.nan, np.nan, np.nan, 5.0, np.nan, 7.0]}
    )
    got = (
        group_quantiles_exact(_ds(df, blocks=2), "k", "v", qs=QS)
        .sort_values(["k", "q"]).reset_index(drop=True)
    )
    exp = _brute(df.dropna(subset=["v"])).sort_values(["k", "q"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_all_nan_group_omitted():
    df = pd.DataFrame({"k": ["a", "a", "z"], "v": [np.nan, np.nan, 3.0]})
    got = group_quantiles_exact(_ds(df, blocks=1), "k", "v", qs=(0.5,))
    assert got["k"].tolist() == ["z"]
    assert got["value"].tolist() == [3.0]
