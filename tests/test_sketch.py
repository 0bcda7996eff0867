"""HyperLogLog distinct-count sketch vs exact counts."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from oluray.stages import sketch


def _ds(df: pd.DataFrame, blocks: int = 5) -> ray.data.Dataset:
    parts = np.array_split(df, blocks)
    return ray.data.from_pandas([p.reset_index(drop=True) for p in parts])


def test_nlz_exact_vs_python():
    rng = np.random.default_rng(5)
    xs = np.concatenate([
        rng.integers(1, 1 << 62, 500, dtype=np.int64).view(np.uint64),
        # the float-log2 trap: values within rounding of powers of two
        np.array([(1 << k) - 1 for k in range(1, 63)], dtype=np.uint64),
        np.array([1 << k for k in range(63)], dtype=np.uint64),
        np.array([0xFFFFFFFFFFFFFFFF], dtype=np.uint64),
    ])
    got = sketch._nlz64(xs)
    exp = np.array([64 - int(x).bit_length() for x in xs], dtype=np.uint64)
    assert np.array_equal(got, exp)


def test_hll_within_error_bound():
    rng = np.random.default_rng(6)
    for true_n in (100, 5_000, 120_000):
        keys = rng.choice(
            np.arange(true_n, dtype=np.int64) * 7_919 + 13, size=true_n * 3
        )
        df = pd.DataFrame({"k": keys})
        est = sketch.hll_count(_ds(df), "k", p=12)
        exact = df["k"].nunique()
        # 1.04/sqrt(4096) ~ 1.6% std error; assert 4 sigma
        assert abs(est - exact) / exact < 0.065, (true_n, est, exact)


def test_hll_registers_mergeable():
    rng = np.random.default_rng(7)
    a = pd.DataFrame({"k": rng.integers(0, 50_000, 30_000)})
    b = pd.DataFrame({"k": rng.integers(25_000, 75_000, 30_000)})
    ra = sketch.hll_registers(_ds(a), "k")
    rb = sketch.hll_registers(_ds(b), "k")
    merged = np.maximum(ra, rb)
    both = sketch.hll_registers(_ds(pd.concat([a, b])), "k")
    # merge of sketches == sketch of union, bit for bit
    assert np.array_equal(merged, both)


def test_hll_empty_and_bad_p():
    est = sketch.hll_count(_ds(pd.DataFrame({"k": pd.Series([], dtype="int64")}), 1), "k")
    assert est == 0
    with pytest.raises(ValueError):
        sketch.hll_registers(_ds(pd.DataFrame({"k": [1]}), 1), "k", p=30)


def test_hll_users_query_vs_exact():
    import duckdb

    from oluray.pipelines import queries as Q

    SF = "/root/testdata/sf0.001"
    est = int(Q.q_hll_users(SF)["distinct_users_est"].iloc[0])
    exact = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert abs(est - exact) / exact < 0.065


def test_heavy_hitters_zipf_recall_and_lower_bound():
    rng = np.random.default_rng(9)
    # zipf-ish: key i with weight ~ 1/(i+1)^1.3 over 2000 keys
    w = 1.0 / np.power(np.arange(1, 2001), 1.3)
    keys = rng.choice(2000, size=120_000, p=w / w.sum()).astype(np.int64)
    df = pd.DataFrame({"k": keys})
    got = sketch.approx_heavy_hitters(_ds(df, blocks=8), "k", k=10,
                                      per_block=64)
    exact = df["k"].value_counts()
    true_top = set(exact.head(10).index.astype(int))
    assert set(got["key"].astype(int)) == true_top
    # reported counts are lower bounds on the exact counts
    for r in got.itertuples():
        assert r.count_lb <= int(exact.loc[r.key])
    # and the head keys (present in every block's top) are exact
    assert got["count_lb"].iloc[0] == int(exact.iloc[0])


def test_heavy_hitters_empty():
    got = sketch.approx_heavy_hitters(
        _ds(pd.DataFrame({"k": pd.Series([], dtype="int64")}), 1), "k"
    )
    assert len(got) == 0


def test_cms_upper_bound_and_mergeable():
    rng = np.random.default_rng(13)
    keys = rng.choice(np.arange(3000, dtype=np.int64) * 31 + 5,
                      size=60_000,
                      p=(lambda w: w / w.sum())(1.0 / np.arange(1, 3001) ** 1.2))
    df = pd.DataFrame({"k": keys})
    cms = sketch.cms_build(_ds(df, 6), "k", width=8192, depth=4)
    exact = df["k"].value_counts()
    probe = exact.index.to_numpy()[:200]
    est = sketch.cms_query(cms, probe)
    true = exact.loc[probe].to_numpy()
    assert (est >= true).all()  # never undercounts
    # overshoot bounded: e*total/width with prob 1-2^-depth per key;
    # assert a loose 4x that bound across all probes
    assert (est - true).max() <= 4 * np.e * len(df) / 8192
    # top keys estimated exactly or near-exactly
    assert est[0] == true[0]

    # merge-of-sketches == sketch-of-union, bit for bit
    a, b = df.iloc[:30_000], df.iloc[30_000:]
    ca = sketch.cms_build(_ds(a, 3), "k", width=8192, depth=4)
    cb = sketch.cms_build(_ds(b, 3), "k", width=8192, depth=4)
    assert np.array_equal(ca + cb, cms)

    import pytest
    with pytest.raises(ValueError):
        sketch.cms_build(_ds(df, 1), "k", width=0)


def test_hll_group_matches_exact_within_error():
    """Per-group HLL vs exact nunique across wildly different
    cardinalities; block order / partitioning must not matter."""
    import ray.data

    from oluray.stages.sketch import hll_count_by_group

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "g": ["big"] * 20000 + ["mid"] * 3000 + ["one"] * 40,
        "v": np.concatenate([
            rng.integers(0, 6000, 20000) + 10_000_000,
            rng.integers(0, 250, 3000),
            np.full(40, -7),
        ]).astype(np.int64),
    })
    exact = df.groupby("g")["v"].nunique()
    for nblocks in (2, 9):
        got = (hll_count_by_group(
            ray.data.from_pandas(df).repartition(nblocks), ["g"], "v", p=12)
            .to_pandas().set_index("g")["approx_distinct"])
        for g, e in exact.items():
            assert abs(int(got[g]) - e) / max(e, 1) < 0.05, (g, int(got[g]), e)


def test_hll_group_empty_and_validation():
    import pytest
    import ray.data

    from oluray.stages.sketch import hll_count_by_group

    df = pd.DataFrame({"g": pd.Series([], dtype="object"),
                       "v": pd.Series([], dtype="int64")})
    out = hll_count_by_group(ray.data.from_pandas(df), ["g"], "v").to_pandas()
    assert len(out) == 0
    with pytest.raises(ValueError):
        hll_count_by_group(ray.data.from_pandas(df), ["g"], "v", p=3)


def test_mp_quantile_rank_error_bound():
    """Munro-Paterson sketch rank error stays under the documented
    bound on uniform AND heavy-tail data at three sizes."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from oluray.stages import sketch as sk

    k = 256
    qs = np.array([0.01, 0.1, 0.5, 0.9, 0.99])
    rng = np.random.default_rng(17)
    for n in (1_000, 20_000, 120_000):
        for data in (rng.uniform(0, 1, n), rng.pareto(1.5, n)):
            ds = rd.from_arrow(pa.table({"v": pa.array(data)})).repartition(7)
            s = sk.mp_quantile_sketch(ds, "v", k=k)
            est = sk.mp_quantile_query(s, qs)
            srt = np.sort(data)
            # rank of the estimate vs target rank
            for q, e in zip(qs, est):
                rank = np.searchsorted(srt, e, side="left")
                err = abs(rank - q * (n - 1))
                levels = max(1, int(np.ceil(np.log2(max(n / k, 2)))))
                assert err <= max(levels * n / (2 * k), k), (n, q, err)


def test_mp_quantile_merge_and_determinism():
    """The sketch is a pure function of data + block layout (no RNG),
    and small inputs (< k values) are EXACT."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from oluray.stages import sketch as sk

    vals = np.arange(100, dtype=np.float64)
    ds = rd.from_arrow(pa.table({"v": pa.array(vals)})).repartition(4)
    s1 = sk.mp_quantile_sketch(ds, "v", k=256)
    s2 = sk.mp_quantile_sketch(ds, "v", k=256)
    qs = [0.0, 0.25, 0.5, 1.0]
    assert np.array_equal(sk.mp_quantile_query(s1, qs),
                          sk.mp_quantile_query(s2, qs))
    # < k values -> every value survives at weight 1 -> exact
    got = sk.mp_quantile_query(s1, qs)
    want = [vals[round(q * 99)] for q in qs]
    assert np.allclose(got, want, atol=1.0)


def test_mp_quantile_empty_raises():
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from oluray.stages import sketch as sk

    ds = rd.from_arrow(pa.table({"v": pa.array([], pa.float64())}))
    s = sk.mp_quantile_sketch(ds, "v")
    with pytest.raises(ValueError):
        sk.mp_quantile_query(s, [0.5])


def test_join_size_estimate_bounds():
    rng = np.random.default_rng(17)
    a = pd.DataFrame({"k": rng.integers(0, 500, 20_000)})
    b = pd.DataFrame({"k": rng.integers(0, 500, 8_000)})
    true = a.merge(b, on="k").shape[0]
    est = sketch.join_size_estimate(_ds(a, 4), "k", _ds(b, 3), "k")
    # CMS inner product never undercounts (hash collisions only add)
    assert est["estimate"] >= true
    # and with width >> distinct keys the overshoot is small
    assert est["estimate"] <= true * 1.05
    # deterministic
    est2 = sketch.join_size_estimate(_ds(a, 4), "k", _ds(b, 3), "k")
    assert est2 == est
