"""Wave-53 checks: greedy meetings vs exponential optimum, LIS vs
O(n^2) DP, real-data invariants."""
import itertools

import numpy as np
import pandas as pd

from oluray.pipelines import queries_wave53 as W

SF = "/root/testdata/sf0.001"


def _optimal_meetings(ts):
    """Exponential exact optimum on tiny inputs."""
    best = 0
    n = len(ts)
    for mask in range(1 << n):
        chosen = sorted(ts[i] for i in range(n) if mask >> i & 1)
        ok = all(chosen[i + 1] >= chosen[i] + W.MEET_WIN_US
                 for i in range(len(chosen) - 1))
        if ok:
            best = max(best, len(chosen))
    return best


def test_greedy_optimal_small():
    rng = np.random.default_rng(23)
    for _ in range(30):
        n = int(rng.integers(1, 10))
        ts = np.sort(rng.integers(0, 4 * W.MEET_WIN_US, n)
                     .astype(np.int64))
        assert W.greedy_meetings(ts) == _optimal_meetings(ts.tolist())


def test_meetings_real():
    got = W.QUERIES["max_meetings"](SF).to_pandas()
    assert len(got) > 0
    assert (got["n_meetings"] >= 1).all()
    assert (got["n_meetings"] <= got["n_events"]).all()


def _lis_dp(vals):
    n = len(vals)
    if n == 0:
        return 0
    dp = [1] * n
    for i in range(n):
        for j in range(i):
            if vals[j] < vals[i]:
                dp[i] = max(dp[i], dp[j] + 1)
    return max(dp)


def test_lis_kernel():
    assert W.lis_length(np.array([], dtype=np.int64)) == 0
    assert W.lis_length(np.array([3, 1, 2, 2, 4])) == 3  # 1,2,4
    assert W.lis_length(np.array([5, 4, 3])) == 1
    rng = np.random.default_rng(29)
    for _ in range(20):
        v = rng.integers(0, 20, rng.integers(1, 40)).astype(np.int64)
        assert W.lis_length(v) == _lis_dp(v.tolist())


def test_lis_real():
    got = W.QUERIES["lis_length"](SF)
    got = (got.to_pandas() if hasattr(got, "to_pandas") else got).iloc[0]
    assert 1 <= int(got["lis"]) <= int(got["n_days"])
