"""skew_join: hot-key-replicated join. Equality vs hash_join on a
heavily skewed fact table (one key = half the rows), across the
explicit-hot-keys path, the auto-detector path, the forced-fallback
path (hot right side over the broadcast budget), and how='left'
null padding."""
import numpy as np
import pandas as pd
import pytest
import ray.data

from oluray.stages import joins
from oluray.stages.sketch import approx_heavy_hitters

N_LEFT = 60_000
N_KEYS = 1_000
HOT_KEY = 7


def _skewed_left() -> ray.data.Dataset:
    rng = np.random.default_rng(11)
    cold = rng.integers(1, N_KEYS + 1, size=N_LEFT // 2)
    k = np.concatenate([np.full(N_LEFT // 2, HOT_KEY, dtype=np.int64),
                        cold.astype(np.int64)])
    rng.shuffle(k)
    return ray.data.from_pandas(
        pd.DataFrame({"k": k, "v": np.arange(N_LEFT, dtype=np.int64)})
    ).repartition(8)


def _right(missing_hot: bool = False) -> ray.data.Dataset:
    keys = np.arange(1, N_KEYS + 1, dtype=np.int64)
    if missing_hot:
        keys = keys[keys != HOT_KEY]
    return ray.data.from_pandas(
        pd.DataFrame({"rk": keys, "name": [f"n{i}" for i in keys]})
    ).repartition(4)


def _norm(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return (df[sorted(df.columns)]
            .sort_values(sorted(df.columns), kind="mergesort")
            .reset_index(drop=True))


@pytest.mark.parametrize("how", ["inner", "left"])
def test_skew_join_equals_hash_join(how):
    left, right = _skewed_left(), _right(missing_hot=(how == "left"))
    exp = _norm(joins.hash_join(left, right, on="k", right_on="rk",
                                how=how, num_partitions=8))
    got = _norm(joins.skew_join(left, right, on="k", right_on="rk",
                                how=how, num_partitions=8,
                                hot_keys=np.array([HOT_KEY])))
    assert got.astype(str).equals(exp.astype(str))
    if how == "inner":
        assert len(got) == N_LEFT  # every left row matched exactly once


def test_auto_detector_finds_the_hot_key():
    left = _skewed_left()
    hh = approx_heavy_hitters(left, "k", k=8, per_block=64)
    assert int(hh.iloc[0]["key"]) == HOT_KEY
    got = _norm(joins.skew_join(left, _right(), on="k", right_on="rk",
                                num_partitions=8, hot_top=8,
                                per_block=64))
    exp = _norm(joins.hash_join(left, _right(), on="k", right_on="rk",
                                num_partitions=8))
    assert got.astype(str).equals(exp.astype(str))


def test_oversized_hot_right_falls_back():
    # both sides hot: the hot right rows exceed the (forced-zero)
    # broadcast budget -> plain hash_join fallback, still exact
    left, right = _skewed_left(), _right()
    got = _norm(joins.skew_join(left, right, on="k", right_on="rk",
                                num_partitions=8,
                                hot_keys=np.array([HOT_KEY]),
                                hot_broadcast_rows=0))
    exp = _norm(joins.hash_join(left, right, on="k", right_on="rk",
                                num_partitions=8))
    assert got.astype(str).equals(exp.astype(str))


def test_empty_hot_set_degrades_to_hash_join():
    left, right = _skewed_left(), _right()
    got = _norm(joins.skew_join(left, right, on="k", right_on="rk",
                                num_partitions=8,
                                hot_keys=np.array([], dtype=np.int64)))
    exp = _norm(joins.hash_join(left, right, on="k", right_on="rk",
                                num_partitions=8))
    assert got.astype(str).equals(exp.astype(str))
