"""Hash-partitioned joins / group ops vs pandas oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from oluray.stages import joins


def _ds(df: pd.DataFrame, blocks: int = 3) -> ray.data.Dataset:
    parts = np.array_split(df, blocks)
    return ray.data.from_pandas([p.reset_index(drop=True) for p in parts])


def test_partition_codes_deterministic_and_bounded():
    df = pd.DataFrame({"k": np.arange(1000), "s": [f"x{i%7}" for i in range(1000)]})
    a = joins.partition_codes(df, ["k"], 64)
    b = joins.partition_codes(df, ["k"], 64)
    assert (a == b).all() and a.min() >= 0 and a.max() < 64
    c = joins.partition_codes(df, ["k", "s"], 16)
    assert c.min() >= 0 and c.max() < 16
    # same key value -> same partition regardless of row position
    df2 = pd.DataFrame({"k": [5, 5, 9], "s": ["a", "a", "b"]})
    c2 = joins.partition_codes(df2, ["k"], 64)
    assert c2[0] == c2[1]


def test_distinct_matches_pandas():
    rng = np.random.default_rng(7)
    df = pd.DataFrame({"a": rng.integers(0, 50, 500), "b": rng.integers(0, 4, 500)})
    got = joins.distinct(_ds(df), ["a", "b"], num_partitions=8).to_pandas()
    exp = df.drop_duplicates(["a", "b"])
    assert len(got) == len(exp)
    assert set(map(tuple, got.to_numpy())) == set(map(tuple, exp.to_numpy()))


def test_grouped_agg_sum_matches_pandas():
    rng = np.random.default_rng(8)
    df = pd.DataFrame({"k": rng.integers(0, 200, 2000), "v": rng.integers(0, 100, 2000)})

    def agg(g):
        return g.groupby("k", as_index=False)["v"].sum()

    got = (
        joins.grouped_agg(_ds(df), ["k"], agg, num_partitions=8, combine_fn=agg)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    exp = df.groupby("k", as_index=False)["v"].sum().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_hash_join_inner_matches_pandas():
    rng = np.random.default_rng(9)
    left = pd.DataFrame(
        {"id": rng.integers(0, 100, 300), "x": rng.standard_normal(300)}
    )
    right = pd.DataFrame(
        {"id": np.arange(0, 80), "name": [f"n{i}" for i in range(80)]}
    )
    got = (
        joins.hash_join(_ds(left), _ds(right, 2), on="id", num_partitions=8)
        .to_pandas().sort_values(["id", "x"]).reset_index(drop=True)
    )
    exp = left.merge(right, on="id").sort_values(["id", "x"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_hash_join_right_on_and_collision_suffix():
    left = pd.DataFrame({"a": [1, 2, 3, 4], "v": [10, 20, 30, 40]})
    right = pd.DataFrame({"b": [2, 3, 3, 9], "v": [200, 300, 301, 900]})
    got = (
        joins.hash_join(_ds(left, 2), _ds(right, 2), on="a", right_on="b",
                        num_partitions=4)
        .to_pandas().sort_values(["a", "v_r"]).reset_index(drop=True)
    )
    exp = (
        left.merge(right.rename(columns={"v": "v_r"}), left_on="a", right_on="b")
        .drop(columns=["b"]).sort_values(["a", "v_r"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_hash_join_large_both_sides_beyond_broadcast():
    """Both sides 'large' (no broadcast anywhere): row-count parity
    with DuckDB on a many-to-many key join."""
    rng = np.random.default_rng(10)
    left = pd.DataFrame({"k": rng.integers(0, 500, 5000), "l": np.arange(5000)})
    right = pd.DataFrame({"k": rng.integers(0, 500, 5000), "r": np.arange(5000)})
    got = joins.hash_join(_ds(left, 5), _ds(right, 5), on="k", num_partitions=16)
    n = got.count()
    exp = left.merge(right, on="k")
    assert n == len(exp)


def test_asof_join_matches_bruteforce():
    rng = np.random.default_rng(11)
    ev = pd.DataFrame(
        {
            "event_id": np.arange(200),
            "user_id": rng.integers(0, 10, 200),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, 200), unit="m"),
        }
    )
    orders = pd.DataFrame(
        {
            "o_custkey": rng.integers(0, 8, 100),  # users 8,9 have no orders
            "o_date": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, 100), unit="m"),
        }
    )
    got = (
        joins.asof_join(
            _ds(ev), _ds(orders, 2), by="user_id", right_by="o_custkey",
            on="ts", right_on="o_date", out_col="last_order", num_partitions=4,
        )
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    exp_vals = []
    for row in ev.itertuples():
        sub = orders[(orders["o_custkey"] == row.user_id) & (orders["o_date"] <= row.ts)]
        exp_vals.append(sub["o_date"].max() if len(sub) else pd.NaT)
    exp = ev.assign(last_order=pd.Series(exp_vals, dtype="datetime64[ns]")).sort_values(
        "event_id"
    ).reset_index(drop=True)
    got["last_order"] = got["last_order"].astype("datetime64[ns]")
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_pair_dedup():
    pairs = pd.DataFrame(
        {"doc_a": [1, 1, 2, 2, 1], "doc_b": [2, 2, 3, 3, 3], "w": [0.9, 0.9, 0.8, 0.8, 0.7]}
    )
    got = joins.pair_dedup(_ds(pairs, 2), ("doc_a", "doc_b"), num_partitions=4).to_pandas()
    assert len(got) == 3
    assert set(zip(got["doc_a"], got["doc_b"])) == {(1, 2), (2, 3), (1, 3)}


def test_semi_join_distributed_and_anti():
    rng = np.random.default_rng(11)
    # keys beyond float53 exactness to pin the typed-isin contract
    big = (1 << 60) + np.arange(0, 40, dtype=np.int64)
    left = pd.DataFrame(
        {"id": np.concatenate([big, big + 1_000_000]), "v": np.arange(80)}
    )
    keys = pd.DataFrame({"id": np.concatenate([big[::2], [123, 456]])})
    got = (
        joins.semi_join(_ds(left, 3), _ds(keys, 2), on="id", num_partitions=4)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    exp = left[left["id"].isin(set(keys["id"]))].sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    assert got["id"].dtype == np.int64  # no float round-trip survives

    anti = (
        joins.semi_join(_ds(left, 3), _ds(keys, 2), on="id", anti=True, num_partitions=4)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    exp_a = left[~left["id"].isin(set(keys["id"]))].sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(anti, exp_a)


def test_semi_join_key_col_rename_and_dup_keys():
    left = pd.DataFrame({"node_id": [1, 2, 3, 4], "x": [10.0, 20.0, 30.0, 40.0]})
    keys = pd.DataFrame({"id": [2, 2, 2, 4, 9]})  # dup keys must not dup rows
    got = (
        joins.semi_join(_ds(left, 2), _ds(keys, 2), on="node_id", key_col="id",
                        num_partitions=4)
        .to_pandas().sort_values("node_id").reset_index(drop=True)
    )
    assert list(got["node_id"]) == [2, 4]
    assert list(got.columns) == ["node_id", "x"]


def test_connected_components_chain_and_islands():
    """Min-label propagation needs multiple rounds for a chain: the
    min id travels one hop per round (a 9-edge path exceeds any
    single round's reach), and separate components stay separate."""
    chain = [(i, i + 1) for i in range(9)]          # component {0..9}
    island = [(100, 101)]                            # component {100,101}
    triangle = [(50, 51), (51, 52), (50, 52)]        # component {50,51,52}
    edges = pd.DataFrame(chain + island + triangle, columns=["doc_a", "doc_b"])
    got = (
        joins.connected_components(_ds(edges, 3), num_partitions=4)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    exp = {**{i: 0 for i in range(10)}, 100: 100, 101: 100,
           50: 50, 51: 50, 52: 50}
    assert dict(zip(got["node"], got["label"])) == exp


def test_connected_components_round_bound_logs_partial():
    """max_rounds too small: labels stay an upper approximation (no
    silent wrong answer — the exit is logged). finish_edges=0 forces
    the pure distributed contraction path, and the graph is built so
    round 1's min-forest splits one component into two trees ({2,4,6,7}
    rooted at 2 and {3,5} rooted at 3) whose merge needs round 2."""
    edges = pd.DataFrame(
        [(3, 5), (5, 7), (2, 4), (4, 6), (7, 2)],
        columns=["doc_a", "doc_b"],
    )
    got = (
        joins.connected_components(_ds(edges, 2), num_partitions=2,
                                   max_rounds=1, finish_edges=0)
        .to_pandas()
    )
    labels = dict(zip(got["node"], got["label"]))
    assert labels[2] == 2 and labels[7] == 2
    assert labels[5] == 3 and labels[3] == 3  # not yet merged into 2
    # and with enough rounds the same graph fully converges
    full = (
        joins.connected_components(_ds(edges, 2), num_partitions=2,
                                   max_rounds=8, finish_edges=0)
        .to_pandas()
    )
    assert set(full["label"]) == {2}


def test_connected_components_long_chain_distributed():
    """A diameter-80 chain through the PURE distributed path
    (finish_edges=0): contraction + pointer doubling must converge in
    far fewer rounds than the diameter (VERDICT r3 item 2)."""
    chain = [(i, i + 1) for i in range(80)]
    edges = pd.DataFrame(chain, columns=["doc_a", "doc_b"])
    got = (
        joins.connected_components(_ds(edges, 3), num_partitions=4,
                                   max_rounds=12, finish_edges=0)
        .to_pandas()
    )
    assert dict(zip(got["node"], got["label"])) == {i: 0 for i in range(81)}


def test_connected_components_random_graph_brute():
    """Random sparse graph vs a brute-force union-find oracle, both
    the default (finish-task) and pure-distributed paths."""
    rng = np.random.default_rng(7)
    n, m = 400, 500
    a = rng.integers(0, n, m) * 13 + 5          # non-contiguous ids
    b = rng.integers(0, n, m) * 13 + 5
    keep = a != b
    edges = pd.DataFrame({"doc_a": a[keep], "doc_b": b[keep]})

    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(edges["doc_a"], edges["doc_b"]):
        parent[find(int(x))] = find(int(y))
    comp = {}
    for v in parent:
        comp.setdefault(find(v), []).append(v)
    exp = {v: min(vs) for vs in comp.values() for v in vs}

    for fe in (1_000_000, 0):
        got = (
            joins.connected_components(_ds(edges, 4), num_partitions=4,
                                       finish_edges=fe)
            .to_pandas()
        )
        assert dict(zip(got["node"], got["label"])) == exp, f"finish={fe}"


def test_range_join_matches_bruteforce():
    """Banded interval join vs an O(n*m) numpy oracle: random ts
    (incl. negatives — floor-division banding must hold below zero),
    intervals spanning 0-5 bands, inclusive BETWEEN endpoints, and
    empty (end < start) intervals contributing nothing."""
    rng = np.random.default_rng(7)
    n, m, band = 400, 120, 100
    left = pd.DataFrame({
        "lid": np.arange(n, dtype=np.int64),
        "ts": rng.integers(-1000, 1000, n).astype(np.int64),
    })
    start = rng.integers(-1000, 1000, m).astype(np.int64)
    length = rng.integers(-50, 500, m).astype(np.int64)  # some empty
    right = pd.DataFrame({
        "rid": np.arange(m, dtype=np.int64),
        "start": start, "end": start + length,
    })
    # exact boundary hits: a ts equal to a start and to an end
    left.loc[0, "ts"] = right.loc[0, "start"]
    left.loc[1, "ts"] = right.loc[1, "end"]

    got = (
        joins.range_join(_ds(left, 4), _ds(right, 3),
                         ts_col="ts", start_col="start", end_col="end",
                         band=band, num_partitions=8)
        .to_pandas().sort_values(["lid", "rid"]).reset_index(drop=True)
    )
    ts = left["ts"].to_numpy()[:, None]
    hit = (right["start"].to_numpy()[None, :] <= ts) & (ts <= right["end"].to_numpy()[None, :])
    li, ri = np.nonzero(hit)
    exp = pd.DataFrame({"lid": left["lid"].to_numpy()[li],
                        "rid": right["rid"].to_numpy()[ri]}).sort_values(
        ["lid", "rid"]).reset_index(drop=True)
    assert len(exp) > 0  # fixture sanity: the oracle actually joins
    pd.testing.assert_frame_equal(got[["lid", "rid"]], exp)
    assert sorted(got.columns) == ["end", "lid", "rid", "start", "ts"]


def test_range_join_empty_and_bad_band():
    import pytest

    left = pd.DataFrame({"lid": pd.array([], dtype="int64"),
                         "ts": pd.array([], dtype="int64")})
    right = pd.DataFrame({"rid": np.array([1], dtype=np.int64),
                          "start": np.array([0], dtype=np.int64),
                          "end": np.array([10], dtype=np.int64)})
    lsch = pa.schema([("lid", pa.int64()), ("ts", pa.int64())])
    out = joins.range_join(_ds(left, 1), _ds(right, 1),
                           ts_col="ts", start_col="start", end_col="end",
                           band=5, num_partitions=4, left_schema=lsch)
    assert out.count() == 0
    with pytest.raises(ValueError):
        joins.range_join(_ds(left, 1), _ds(right, 1), ts_col="ts",
                         start_col="start", end_col="end", band=0)


def test_group_topk_matches_pandas():
    """Combiner + shuffle top-k vs a single-frame pandas oracle,
    incl. groups smaller than k and exact ties broken by the unique
    column."""
    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame({
        "g": rng.integers(0, 300, n).astype(np.int64),
        "v": rng.integers(0, 40, n).astype(np.int64),  # many ties
        "uid": np.arange(n, dtype=np.int64),
    })
    got = (
        joins.group_topk(_ds(df, 6), ["g"], [("v", False), ("uid", True)],
                         k=3, num_partitions=8)
        .to_pandas().sort_values(["g", "v", "uid"],
                                 ascending=[True, False, True])
        .reset_index(drop=True)
    )
    exp = (
        df.sort_values(["g", "v", "uid"], ascending=[True, False, True],
                       kind="mergesort")
        .groupby("g", sort=False).head(3)
        .sort_values(["g", "v", "uid"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["g", "v", "uid"]], exp)

    import pytest
    with pytest.raises(ValueError):
        joins.group_topk(_ds(df, 2), ["g"], [("v", True)], k=0)


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)


def test_broadcast_join_matches_hash_join():
    """broadcast_join's contract is exact hash_join parity: columns,
    order, types, null padding — for inner and left, with collision
    suffix and a distinct right key name."""
    rng = np.random.default_rng(21)
    left = pd.DataFrame(
        {"id": rng.integers(0, 60, 250), "x": rng.standard_normal(250),
         "name": [f"L{i%5}" for i in range(250)]}
    )
    right = pd.DataFrame(
        {"rid": np.arange(0, 40, 2), "name": [f"R{i}" for i in range(20)],
         "w": rng.integers(0, 9, 20)}
    )
    for how in ("inner", "left"):
        hj = joins.hash_join(
            _ds(left), _ds(right, 2), on="id", right_on="rid", how=how,
            num_partitions=8,
        ).to_pandas()
        bj = joins.broadcast_join(
            _ds(left), right, on="id", right_on="rid", how=how,
        ).to_pandas()
        assert list(hj.columns) == list(bj.columns)
        pd.testing.assert_frame_equal(_sorted(hj), _sorted(bj))


def test_auto_join_dispatch_and_parity():
    rng = np.random.default_rng(22)
    left = pd.DataFrame({"k": rng.integers(0, 30, 200), "v": np.arange(200)})
    right = pd.DataFrame({"k": np.arange(30), "tag": [f"t{i}" for i in range(30)]})
    exp = _sorted(left.merge(right, on="k", how="inner"))

    # under the bounds -> broadcast path (no groupby stage in the plan)
    small = joins.auto_join(_ds(left), _ds(right, 2), on="k")
    assert "map_groups" not in str(small._plan).lower()
    pd.testing.assert_frame_equal(_sorted(small.to_pandas()), exp, check_dtype=False)

    # forced over the row bound -> shuffle path, same rows
    big = joins.auto_join(_ds(left), _ds(right, 2), on="k", broadcast_rows=5)
    pd.testing.assert_frame_equal(_sorted(big.to_pandas()), exp, check_dtype=False)

    # right joins always take the shuffle path
    rj = joins.auto_join(_ds(left), _ds(right, 2), on="k", how="right")
    expr = _sorted(left.merge(right, on="k", how="right"))
    pd.testing.assert_frame_equal(
        _sorted(rj.to_pandas()), expr, check_dtype=False
    )


def test_broadcast_join_rejects_outer_and_empty_right():
    left = pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0]})
    import pytest

    with pytest.raises(ValueError, match="inner"):
        joins.broadcast_join(_ds(left, 1), left, on="k", how="outer")
    # empty right with a schema hint: all-left rows with null pads
    empty = pd.DataFrame({"k": pd.Series([], dtype="int64"),
                          "tag": pd.Series([], dtype="object")})
    sch = pa.schema([pa.field("k", pa.int64()), pa.field("tag", pa.string())])
    out = joins.broadcast_join(
        _ds(left, 1), empty, on="k", how="left", right_schema=sch
    ).to_pandas()
    assert len(out) == 2 and out["tag"].isna().all()


def test_group_ntile_exact_sql_semantics():
    """NTILE(k): first n%k tiles one row larger; n<k gives one row per
    tile; deterministic under ties via the unique trailing column."""
    df = pd.DataFrame({
        "g": ["a"] * 7 + ["b"] * 3 + ["c"] * 10,
        "v": [5, 5, 5, 1, 2, 2, 9,  4, 4, 4,  *range(10)],
        "id": range(20),
    })
    got = (
        joins.group_ntile(_ds(df), ["g"], [("v", True), ("id", True)],
                          k=3, num_partitions=4)
        .to_pandas().sort_values(["g", "v", "id"]).reset_index(drop=True)
    )
    exp_rows = []
    for g, grp in df.groupby("g"):
        grp = grp.sort_values(["v", "id"])
        n, k = len(grp), 3
        big, small = n % k, n // k
        tiles = []
        for t in range(1, k + 1):
            tiles += [t] * (small + (1 if t <= big else 0))
        grp = grp.assign(tile=tiles[: n])
        exp_rows.append(grp)
    exp = (pd.concat(exp_rows).sort_values(["g", "v", "id"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    # n < k: each row its own tile
    one = pd.DataFrame({"g": ["z"] * 2, "v": [9, 3], "id": [0, 1]})
    got2 = joins.group_ntile(_ds(one, 1), ["g"], [("v", True), ("id", True)],
                             k=10).to_pandas().sort_values("v")
    assert got2["tile"].tolist() == [1, 2]

    import pytest
    with pytest.raises(ValueError):
        joins.group_ntile(_ds(one, 1), ["g"], [("v", True)], k=0)


def test_bloom_no_false_negatives_and_fp_bounded():
    rng = np.random.default_rng(31)
    members = np.unique(rng.integers(0, 1 << 40, 5000))
    keys = ray.data.from_pandas(pd.DataFrame({"k": members}))
    bm = joins.build_bloom(keys, "k", bits=1 << 20)  # ~210 bits/key
    probe_df = pd.DataFrame({"k": members})
    hit = joins.bloom_prefilter(_ds(probe_df), "k", bm).to_pandas()
    assert len(hit) == len(members)  # every member survives
    outsiders = np.setdiff1d(
        rng.integers(0, 1 << 40, 20000), members
    )
    fp = joins.bloom_prefilter(
        _ds(pd.DataFrame({"k": outsiders})), "k", bm
    ).count()
    assert fp / len(outsiders) < 0.01  # generous bound at this load


def test_semi_join_bloom_path_identical():
    rng = np.random.default_rng(32)
    left = pd.DataFrame({"id": rng.integers(0, 5000, 3000),
                         "x": np.arange(3000)})
    keys = pd.DataFrame({"id": rng.integers(0, 5000, 400)})
    plain = joins.semi_join(_ds(left), _ds(keys, 2), on="id",
                            num_partitions=8).to_pandas()
    bloom = joins.semi_join(_ds(left), _ds(keys, 2), on="id",
                            num_partitions=8, bloom_bits=1 << 16).to_pandas()
    cols = ["id", "x"]
    pd.testing.assert_frame_equal(
        plain[cols].sort_values(cols).reset_index(drop=True),
        bloom[cols].sort_values(cols).reset_index(drop=True),
    )
    with __import__("pytest").raises(ValueError, match="power of two"):
        joins.build_bloom(_ds(keys, 1), "id", bits=1000)


def test_interval_join_matches_bruteforce():
    """Canonical-band count-once rule vs O(n*m) brute overlap, incl.
    negative starts, zero-length and multi-band intervals."""
    rng = np.random.default_rng(41)
    nl, nr = 120, 90
    ls = rng.integers(-500, 500, nl)
    le = ls + rng.integers(0, 120, nl)  # 0..multi-band at band=37
    rs = rng.integers(-500, 500, nr)
    re_ = rs + rng.integers(0, 90, nr)
    left = pd.DataFrame({"lid": np.arange(nl), "ls": ls, "le": le})
    right = pd.DataFrame({"rid": np.arange(nr), "rs": rs, "re": re_})
    got = joins.interval_join(
        _ds(left), _ds(right, 2), left_start="ls", left_end="le",
        right_start="rs", right_end="re", band=37, num_partitions=8,
    ).to_pandas()
    gotset = set(zip(got["lid"].astype(int), got["rid"].astype(int)))
    want = {
        (int(i), int(j))
        for i in range(nl) for j in range(nr)
        if ls[i] <= re_[j] and rs[j] <= le[i]
    }
    assert gotset == want
    assert len(got) == len(want)  # exactly once each, no dupes
    assert len(want) > 0


def test_group_rank_tie_semantics():
    """RANK gaps after ties, DENSE_RANK doesn't; PERCENT_RANK 0 for
    n=1; CUME_DIST counts the whole peer group for every member."""
    df = pd.DataFrame({
        "g": ["a"] * 6 + ["b"],
        "v": [10, 10, 20, 20, 20, 30, 5],
        "id": range(7),
    })
    got = (
        joins.group_rank(_ds(df), ["g"], [("v", True)], num_partitions=4)
        .to_pandas().sort_values(["g", "v", "id"]).reset_index(drop=True)
    )
    a = got[got["g"] == "a"]
    assert a["rank"].tolist() == [1, 1, 3, 3, 3, 6]
    assert a["dense_rank"].tolist() == [1, 1, 2, 2, 2, 3]
    assert a["percent_rank"].tolist() == [0.0, 0.0, 0.4, 0.4, 0.4, 1.0]
    assert a["cume_dist"].tolist() == [
        2 / 6, 2 / 6, 5 / 6, 5 / 6, 5 / 6, 1.0
    ]
    b = got[got["g"] == "b"]
    assert b["rank"].tolist() == [1]
    assert b["percent_rank"].tolist() == [0.0]
    assert b["cume_dist"].tolist() == [1.0]


def test_asof_join_forward_and_nearest():
    left = pd.DataFrame({
        "u": [1, 1, 1, 2],
        "t": pd.to_datetime([10, 25, 90, 50], unit="s").astype("datetime64[us]"),
        "lid": range(4),
    })
    right = pd.DataFrame({
        "u": [1, 1, 2],
        "rt": pd.to_datetime([20, 80, 10], unit="s").astype("datetime64[us]"),
    })
    fwd = joins.asof_join(
        _ds(left, 2), _ds(right, 1), by="u", right_by="u", on="t",
        right_on="rt", out_col="nxt", num_partitions=4, direction="forward",
    ).to_pandas().sort_values("lid")
    exp_fwd = pd.to_datetime([20, 80, None, None], unit="s")
    assert fwd["nxt"].tolist() == list(exp_fwd)
    near = joins.asof_join(
        _ds(left, 2), _ds(right, 1), by="u", right_by="u", on="t",
        right_on="rt", out_col="near", num_partitions=4, direction="nearest",
    ).to_pandas().sort_values("lid")
    exp_near = pd.to_datetime([20, 20, 80, 10], unit="s")
    assert near["near"].tolist() == list(exp_near)
    import pytest
    with pytest.raises(ValueError, match="direction"):
        joins.asof_join(_ds(left, 1), _ds(right, 1), by="u", right_by="u",
                        on="t", right_on="rt", out_col="x", direction="x")


def test_auto_join_side_swap_parity():
    """Inner join with a big right and a small left: the swap path must
    produce exactly hash_join's columns, order and rows."""
    rng = np.random.default_rng(51)
    small = pd.DataFrame({"k": np.arange(20), "tag": [f"t{i}" for i in range(20)]})
    big = pd.DataFrame({"k": rng.integers(0, 25, 500), "v": np.arange(500)})
    hj = joins.hash_join(_ds(small, 1), _ds(big), on="k",
                         num_partitions=8).to_pandas()
    # force the swap: right over the row bound, left under it
    sw = joins.auto_join(_ds(small, 1), _ds(big), on="k",
                         broadcast_rows=100).to_pandas()
    assert list(sw.columns) == list(hj.columns)
    pd.testing.assert_frame_equal(_sorted(sw), _sorted(hj), check_dtype=False)

    # collision case must NOT swap (falls back to shuffle, same rows)
    big2 = big.rename(columns={"v": "tag"})
    hj2 = joins.hash_join(_ds(small, 1), _ds(big2), on="k",
                          num_partitions=8).to_pandas()
    sw2 = joins.auto_join(_ds(small, 1), _ds(big2), on="k",
                          broadcast_rows=100).to_pandas()
    pd.testing.assert_frame_equal(_sorted(sw2), _sorted(hj2), check_dtype=False)


def test_new_operators_empty_inputs():
    """Empty-input robustness across the r3 operator wave (ADVICE r2
    theme: entry points must match the per-block hardening)."""
    import pyarrow as pa

    empty_iv = _ds(pd.DataFrame({"lid": pd.Series([], dtype="int64"),
                                 "ls": pd.Series([], dtype="int64"),
                                 "le": pd.Series([], dtype="int64")}), 1)
    right = _ds(pd.DataFrame({"rid": [1], "rs": [0], "re": [10]}), 1)
    assert joins.interval_join(
        empty_iv, right, "ls", "le", "rs", "re", band=5,
        left_schema=pa.schema([("lid", pa.int64()), ("ls", pa.int64()),
                               ("le", pa.int64())]),
        right_schema=pa.schema([("rid", pa.int64()), ("rs", pa.int64()),
                                ("re", pa.int64())]),
    ).count() == 0

    emptyg = _ds(pd.DataFrame({"g": pd.Series([], dtype="object"),
                               "v": pd.Series([], dtype="int64"),
                               "id": pd.Series([], dtype="int64")}), 1)
    assert joins.group_ntile(emptyg, ["g"], [("v", True), ("id", True)],
                             k=3).count() == 0
    assert joins.group_rank(emptyg, ["g"], [("v", True)]).count() == 0


def test_polygon_join_empty_left_typed():
    import pyarrow as pa
    import ray.data as rd

    from oluray.sources import fixtures
    from oluray.stages import spatial

    ring_t = pa.list_(pa.struct([("lon", pa.float64()),
                                 ("lat", pa.float64())]))
    ep = rd.from_arrow(pa.table({"a_id": pa.array([], pa.int64()),
                                 "ring": pa.array([], ring_t)}))
    t = fixtures.make_change_polys(3, seed=3)
    polys = rd.from_arrow(pa.table({"b_id": t["poly_id"], "ring": t["ring"]}))
    assert spatial.polygon_join(ep, polys, res=4, num_partitions=4).count() == 0


def test_auto_join_survives_stale_projected_schema():
    """Regression: Ray 2.49 reports a stale pre-projection schema()
    on a materialized select_columns lineage (the dropped columns
    reappear in schema().names while blocks hold the projected data).
    auto_join must derive the right-side schema from actual blocks,
    or the broadcast path KeyErrors / the shuffle path pads phantom
    columns."""
    left = _ds(pd.DataFrame({"k": np.arange(8, dtype=np.int64),
                             "lv": np.arange(8, dtype=np.int64) * 10}))
    dim = _ds(pd.DataFrame({"k": np.arange(8, dtype=np.int64),
                            "a": np.arange(8, dtype=np.int64),
                            "b": np.arange(8, dtype=np.int64) + 100}), 1)
    # produce the Project-on-join lineage that exhibits the stale schema
    enriched = joins.auto_join(left, dim, on="k", num_partitions=2)
    sel = enriched.select_columns(["k", "a"])
    out = joins.auto_join(
        _ds(pd.DataFrame({"k": np.arange(8, dtype=np.int64),
                          "x": np.arange(8, dtype=np.int64)})),
        sel, on="k", num_partitions=2).to_pandas()
    assert sorted(out.columns) == ["a", "k", "x"]
    assert len(out) == 8


def test_semi_join_big_keys_survive_pandas_sort_lineage():
    """Regression: keys above 2^53 fed through a partitioned_map
    (pandas map_groups) lineage used to corrupt inside semi_join —
    Ray's sort round-trips some lineages through pandas, and a
    NULL-padded int64 column upcasts to float64, silently rounding
    res*2^58-scale cell ids. _tag_and_pad now zero-pads integer
    columns so no null-driven upcast can happen."""
    big = np.int64(4) * np.int64(2**58) + np.arange(40, dtype=np.int64) * 7919
    src = _ds(pd.DataFrame({"cell": big}), blocks=4)

    def ident(df: pd.DataFrame) -> pd.DataFrame:
        return df[["cell"]]

    # pandas-block lineage with sparse/empty partitions, like a real
    # grouped_agg output
    keys = joins.partitioned_map(src, ["cell"], ident, num_partitions=8)
    left = pd.DataFrame({"cell": np.concatenate([big, big]),
                         "nbr": np.concatenate([big, big + 1])})
    out = joins.semi_join(
        _ds(left, 4), keys, on="nbr", key_col="cell", num_partitions=8,
        left_schema=pa.schema([("cell", pa.int64()), ("nbr", pa.int64())]),
        keys_schema=pa.schema([("cell", pa.int64())]),
    ).to_pandas()
    # exactly the rows whose nbr is a real key — bit-exact values
    assert len(out) == 40
    assert sorted(out["nbr"]) == sorted(big)
    assert sorted(out["cell"]) == sorted(big)

    # same guarantee for hash_join carried columns
    right = pd.DataFrame({"k": big, "v": big * 0 + 7})
    j = joins.hash_join(
        _ds(left.rename(columns={"nbr": "k"}), 4),
        joins.partitioned_map(_ds(right, 4), ["k"], lambda d: d,
                              num_partitions=8),
        on="k", num_partitions=8,
        left_schema=pa.schema([("cell", pa.int64()), ("k", pa.int64())]),
        right_schema=pa.schema([("k", pa.int64()), ("v", pa.int64())]),
    ).to_pandas()
    assert len(j) == 40
    assert sorted(j["k"]) == sorted(big)
    assert sorted(j["cell"]) == sorted(big)
