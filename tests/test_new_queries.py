"""Brute-force checks for the r3 query-catalog additions that the
DuckDB oracle can't see: z-order locality (the value hash is order-
insensitive) and the rolling-window edge semantics."""
import numpy as np
import pandas as pd

from oluray.functions import geo
from oluray.pipelines import queries as Q

SF = "/root/testdata/sf0.001"


def test_morton_locality_beats_row_order():
    """Sorting cells by morton code yields smaller mean spatial hops
    between neighbours than the raw key order — the whole point of
    the z-order sink layout."""
    got = Q.q_zorder_cells(SF).to_pandas()
    _, x, y = geo.cell_decode(got["cell"].to_numpy())

    def mean_hop(order: np.ndarray) -> float:
        return float(np.mean(np.abs(np.diff(x[order]))
                             + np.abs(np.diff(y[order]))))

    by_key = np.argsort(got["c_custkey"].to_numpy(), kind="stable")
    by_morton = np.argsort(got["morton"].to_numpy(), kind="stable")
    assert mean_hop(by_morton) < 0.5 * mean_hop(by_key)


def test_morton_roundtrip_bit_interleave():
    rng = np.random.default_rng(11)
    res = 12
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-90, 90, 200)
    cells = geo.cell_encode(lon, lat, res)
    m = geo.morton_code(cells)
    _, x, y = geo.cell_decode(cells)
    # de-interleave and compare
    xx = np.zeros_like(x)
    yy = np.zeros_like(y)
    for i in range(res):
        xx |= ((m >> (2 * i)) & 1) << i
        yy |= ((m >> (2 * i + 1)) & 1) << i
    assert np.array_equal(xx, x) and np.array_equal(yy, y)


def test_rolling_24h_peer_and_boundary_semantics():
    """RANGE-frame semantics vs an O(n^2) oracle: equal-ts peers all
    included (even 'later' ones), the -24h boundary inclusive."""
    ts = pd.to_datetime([
        "2024-01-01 00:00:00.000000", "2024-01-01 12:00:00.000000",
        "2024-01-02 00:00:00.000000",       # exactly 24h after row 0
        "2024-01-02 00:00:00.000000",       # peer of row 2
        "2024-01-03 00:00:00.000001",       # just outside 24h of row 2
    ], format="%Y-%m-%d %H:%M:%S.%f")
    df = pd.DataFrame({
        "event_id": np.arange(5, dtype=np.int64),
        "user_id": np.int64(7),
        "ts": ts.astype("datetime64[us]"),
        "value": [1.0, 2.0, 4.0, 8.0, 16.0],
    })
    # run the real query over a one-table scratch sf_dir
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp()
    pq.write_table(pa.Table.from_pandas(df), os.path.join(d, "events.parquet"))
    got = (
        Q.q_rolling_24h(d).to_pandas()
        .sort_values("event_id").reset_index(drop=True)
    )
    W = pd.Timedelta(hours=24)
    exp_n, exp_sum = [], []
    cents = np.round(df["value"].to_numpy() * 100).astype(np.int64)
    for i in range(len(df)):
        m = (df["ts"] >= df["ts"][i] - W) & (df["ts"] <= df["ts"][i])
        exp_n.append(int(m.sum()))
        exp_sum.append(int(cents[m.to_numpy()].sum()))
    assert got["w_n"].tolist() == exp_n
    assert got["w_sum_cents"].tolist() == exp_sum
    # the peer rows (2,3) must have identical windows incl. each other
    assert got.loc[2, "w_n"] == got.loc[3, "w_n"] == 4


def test_cell_pyramid_levels_consistent():
    got = Q.q_cell_pyramid(SF).to_pandas()
    res, _, _ = geo.cell_decode(got["cell"].to_numpy())
    got["res"] = res
    totals = got.groupby("res")["n"].sum()
    # every zoom level accounts for every point exactly once
    assert totals.nunique() == 1
    lv12 = got[got["res"] == 12]
    lv8 = got[got["res"] == 8].set_index("cell")["n"]
    roll = (
        pd.Series(lv12["n"].to_numpy(),
                  index=geo.cell_parent(lv12["cell"].to_numpy(), 8))
        .groupby(level=0).sum()
    )
    pd.testing.assert_series_equal(
        roll.sort_index(), lv8.sort_index(), check_names=False
    )


def _scratch_sf(**tables) -> str:
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp()
    for name, df in tables.items():
        pq.write_table(pa.Table.from_pandas(df), os.path.join(d, f"{name}.parquet"))
    return d


def test_running_total_negative_values_sign_safe():
    """The per-segment base subtraction must not assume the running
    sum is monotone (negative values break a max-accumulate-on-csum
    shortcut)."""
    df = pd.DataFrame({
        "event_id": np.arange(6, dtype=np.int64),
        "user_id": np.array([1, 1, 1, 2, 2, 2], dtype=np.int64),
        "ts": pd.date_range("2024-01-01", periods=6, freq="1h")
                .astype("datetime64[us]"),
        "value": [-5.0, 3.0, -1.0, 10.0, -20.0, 4.0],
    })
    got = (
        Q.q_running_total(_scratch_sf(events=df)).to_pandas()
        .sort_values("event_id").reset_index(drop=True)
    )
    assert got["run_cents"].tolist() == [-500, -200, -300, 1000, -1000, -600]


def test_cust_event_counts_left_join_zero_fill():
    cust = pd.DataFrame({"c_custkey": np.arange(5, dtype=np.int64)})
    ev = pd.DataFrame({
        "user_id": np.array([0, 0, 3], dtype=np.int64),
        "event_id": np.arange(3, dtype=np.int64),
        "value": [1.0, 2.0, 4.0],
    })
    got = (
        Q.q_cust_event_counts(_scratch_sf(customer=cust, events=ev))
        .to_pandas().sort_values("c_custkey").reset_index(drop=True)
    )
    assert got["n_events"].tolist() == [2, 0, 0, 1, 0]
    assert got["sum_cents"].tolist() == [300, 0, 0, 400, 0]
    assert str(got["n_events"].dtype) == "int64"


def test_rolling_24h_many_users_and_fallback_path(monkeypatch):
    """Multi-year spans x many users — the case whose packed key used to
    overflow int64 — plus the forced per-segment fallback branch, both
    against an O(n^2) oracle."""
    rng = np.random.default_rng(11)
    n = 400
    base = pd.Timestamp("2005-01-01").value // 1000  # us
    span = 20 * 365 * 86_400_000_000  # ~20 years in us
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 60, n).astype(np.int64),
        "ts": pd.to_datetime(base + rng.integers(0, span, n), unit="us")
                .astype("datetime64[us]"),
        "value": rng.normal(50, 10, n).round(2),
    })
    d = _scratch_sf(events=df)

    W = pd.Timedelta(hours=24)
    cents = np.round(df["value"].to_numpy() * 100).astype(np.int64)
    exp = []
    for i in range(n):
        m = (
            (df["user_id"] == df["user_id"][i])
            & (df["ts"] >= df["ts"][i] - W) & (df["ts"] <= df["ts"][i])
        ).to_numpy()
        exp.append((int(m.sum()), int(cents[m].sum())))
    exp_n = [e[0] for e in exp]
    exp_s = [e[1] for e in exp]

    got = (Q.q_rolling_24h(d).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    assert got["w_n"].tolist() == exp_n
    assert got["w_sum_cents"].tolist() == exp_s

    # force the exact per-segment loop branch and require identical output
    monkeypatch.setattr(Q, "_ROLL_KEY_LIMIT", 1.0)
    got2 = (Q.q_rolling_24h(d).to_pandas()
            .sort_values("event_id").reset_index(drop=True))
    assert got2["w_n"].tolist() == exp_n
    assert got2["w_sum_cents"].tolist() == exp_s


def test_sales_rollup_levels_consistent():
    got = Q.q_sales_rollup(SF).to_pandas()
    detail = got[(got["l_returnflag"] != "ALL") & (got["l_linestatus"] != "ALL")]
    mid = got[(got["l_returnflag"] != "ALL") & (got["l_linestatus"] == "ALL")]
    total = got[(got["l_returnflag"] == "ALL") & (got["l_linestatus"] == "ALL")]
    assert len(total) == 1
    # every level accounts for every row exactly once
    assert detail["n"].sum() == mid["n"].sum() == total["n"].iloc[0]
    assert detail["sum_qty"].sum() == total["sum_qty"].iloc[0]
    # mid level equals detail rolled up by flag
    roll = detail.groupby("l_returnflag")["n"].sum().sort_index()
    pd.testing.assert_series_equal(
        roll, mid.set_index("l_returnflag")["n"].sort_index(),
        check_names=False,
    )


def test_merge_intervals_islands():
    """Touching windows merge, a >30min gap splits, singleton island
    end = start + 30min — vs hand-computed islands."""
    ts = pd.to_datetime([
        "2024-01-01 00:00", "2024-01-01 00:20",   # overlap -> one island
        "2024-01-01 00:50",                        # touches 00:20+30 -> merges
        "2024-01-01 02:00",                        # gap -> new island
    ]).astype("datetime64[us]")
    df = pd.DataFrame({
        "event_id": np.arange(4, dtype=np.int64),
        "user_id": np.int64(3),
        "ts": ts,
    })
    d = _scratch_sf(events=df)
    got = (Q.q_merge_intervals(d).to_pandas()
           .sort_values("island_start").reset_index(drop=True))
    assert len(got) == 2
    assert got["n_events"].tolist() == [3, 1]
    assert got["island_start"].iloc[0] == ts[0]
    assert got["island_end"].iloc[0] == ts[2] + pd.Timedelta(minutes=30)
    assert got["island_end"].iloc[1] == ts[3] + pd.Timedelta(minutes=30)


def test_track_length_brute():
    """Per-user haversine track length vs an explicit per-segment
    Python sum (points derived from event_id, order by ts then id)."""
    ts = pd.date_range("2024-01-01", periods=6, freq="1h").astype("datetime64[us]")
    df = pd.DataFrame({
        "event_id": np.array([10, 11, 12, 20, 21, 30], dtype=np.int64),
        "user_id": np.array([1, 1, 1, 2, 2, 3], dtype=np.int64),
        "ts": ts,
    })
    got = (Q.q_track_length(_scratch_sf(events=df)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    lon, lat = geo.derive_lonlat(df["event_id"].to_numpy())
    exp = {}
    for uid in (1, 2, 3):
        idx = np.where(df["user_id"].to_numpy() == uid)[0]
        mm = 0
        for a, b in zip(idx[:-1], idx[1:]):
            d = float(geo.haversine_m(lon[a:a+1], lat[a:a+1],
                                      lon[b:b+1], lat[b:b+1])[0])
            mm += int(np.floor(abs(d * 1000.0) + 0.5))
        exp[uid] = (len(idx), mm)
    assert got["n_points"].tolist() == [exp[u][0] for u in (1, 2, 3)]
    assert got["track_mm"].tolist() == [exp[u][1] for u in (1, 2, 3)]


def test_star_poly_area_matches_python_int_oracle():
    """Shoelace 2A per nation vs an arbitrary-precision Python oracle
    (same angle ordering rule) — proves the int64 vectorized path has
    no overflow/ordering defect at test scale."""
    got = (Q.q_star_poly_area(SF).to_pandas()
           .sort_values("c_nationkey").reset_index(drop=True))
    import duckdb
    cust = duckdb.sql(
        f"SELECT c_custkey, c_nationkey FROM '{SF}/customer.parquet'").df()
    lon, lat = geo.derive_lonlat(cust["c_custkey"].to_numpy())

    def snap(v):
        return int(np.floor(abs(v * 1e4) + 0.5)) * (1 if v >= 0 else -1)

    for nat, sub in cust.assign(lon=lon, lat=lat).groupby("c_nationkey"):
        xs = [snap(v) for v in sub["lon"]]
        ys = [snap(v) for v in sub["lat"]]
        cx = (min(xs) + max(xs)) // 2
        cy = (min(ys) + max(ys)) // 2
        order = sorted(range(len(xs)), key=lambda i: (
            np.arctan2(float(ys[i] - cy), float(xs[i] - cx)),
            sub["c_custkey"].iloc[i]))
        a2 = 0
        for j in range(len(order)):
            i0, i1 = order[j], order[(j + 1) % len(order)]
            a2 += xs[i0] * ys[i1] - xs[i1] * ys[i0]   # python ints: exact
        row = got[got["c_nationkey"] == nat].iloc[0]
        assert int(row["area2_e8"]) == a2 and int(row["n_pts"]) == len(xs)


def test_word_stats_known_docs():
    docs = pd.DataFrame({
        "doc_id": np.array([1, 2], dtype=np.int64),
        "text": ["a a b", "x y z"],
    })
    got = (Q.q_word_stats(_scratch_sf(documents=docs)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got.loc[0].tolist() == [1, 3, 2, 333333, 666666]
    assert got.loc[1].tolist() == [2, 3, 3, 0, 333333]


def test_full_outer_exclusive_sides():
    """Left-only users (below the balance cut) and right-only
    customers (no events) both survive the outer join with their
    sentinels."""
    ev = pd.DataFrame({
        "user_id": np.array([1, 1, 2], dtype=np.int64),
        "event_id": np.array([100, 101, 102], dtype=np.int64),
        "ts": pd.date_range("2024-01-01", periods=3, freq="1min")
                .astype("datetime64[us]"),
    })
    cust = pd.DataFrame({
        "c_custkey": np.array([2, 3], dtype=np.int64),
        "c_nationkey": np.array([0, 0], dtype=np.int64),
        "c_acctbal": [6000.0, 7000.5],
    })
    got = (Q.q_full_outer(_scratch_sf(events=ev, customer=cust)).to_pandas()
           .sort_values("ukey").reset_index(drop=True))
    assert got["ukey"].tolist() == [1, 2, 3]
    assert got["n_events"].tolist() == [2, 1, 0]
    assert got["acctbal_cents"].tolist() == [-1, 600000, 700050]


def test_semdedup_matches_brute_greedy():
    """semdedup_keep vs a plain-Python greedy oracle with one cluster
    (n_centroids=1 removes clustering from the comparison)."""
    import ray.data

    from oluray.stages import ann

    rng = np.random.default_rng(5)
    base = rng.normal(size=(4, 8))
    # rows 4..7 are near-dups of rows 0..3 (tiny perturbation)
    vecs = np.vstack([base, base + rng.normal(scale=1e-3, size=(4, 8))])
    ids = np.arange(8, dtype=np.int64)
    tbl = pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})
    ds = ray.data.from_pandas(tbl)
    tau = 0.99
    got = sorted(ann.semdedup_keep(ds, n_centroids=1, tau=tau,
                                   sample_size=8, num_partitions=2)
                 .to_pandas()["vec_id"].tolist())
    m = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    kept = []
    for i in range(8):
        if not kept or max(float(m[j] @ m[i]) for j in kept) <= tau:
            kept.append(i)
    assert got == kept
    assert got == [0, 1, 2, 3]  # the perturbed copies were dropped


def test_image_quality_known_images():
    from oluray.functions import imagecodec
    from oluray.stages.image import QualityStats
    import pyarrow as pa

    flat = np.full((8, 8, 3), 100, np.uint8)
    checker = np.zeros((8, 8, 3), np.uint8)
    checker[::2, 1::2] = 255
    checker[1::2, ::2] = 255
    batch = pa.table({
        "image_id": pa.array(["flat", "checker"]),
        "bytes": pa.array([imagecodec.encode_png(flat),
                           imagecodec.encode_png(checker)], pa.binary()),
        "fmt": pa.array(["png", "png"]),
    })
    out = QualityStats()(batch).to_pandas().set_index("image_id")
    assert out.loc["flat", "sharpness"] == 0.0
    assert out.loc["flat", "contrast"] == 0.0
    assert out.loc["flat", "brightness"] == 100.0
    assert out.loc["checker", "sharpness"] > 0.0
    # brute Laplacian variance on the checker luma
    luma = checker.mean(axis=2)
    lap = (4 * luma[1:-1, 1:-1] - luma[:-2, 1:-1] - luma[2:, 1:-1]
           - luma[1:-1, :-2] - luma[1:-1, 2:])
    assert abs(out.loc["checker", "sharpness"] - round(lap.var(), 4)) < 1e-9


def test_weighted_sample_prefers_heavy_docs():
    """A-ES with one dominant weight: the heavy doc must appear in
    the per-lang sample; brute-force priority ranking agrees."""
    docs = pd.DataFrame({
        "doc_id": np.arange(1, 13, dtype=np.int64),
        "lang": ["en"] * 12,
        "n_chars": np.array([10] * 11 + [10_000_000], dtype=np.int64),
    })
    got = (Q.q_weighted_sample(_scratch_sf(documents=docs)).to_pandas()
           .sort_values("doc_id"))
    h = (docs["doc_id"].to_numpy(np.int64) * 2654435761) % 4294967296
    u = (h.astype(np.float64) + 0.5) / 4294967296.0
    pri = np.log(u) / docs["n_chars"].to_numpy(np.float64)
    exp = set(docs["doc_id"].to_numpy()[np.argsort(-pri, kind="stable")][:5])
    assert set(got["doc_id"]) == exp
    assert 12 in exp  # the heavy doc always makes the sample


def test_unpivot_inverse_of_wide():
    got = Q.q_unpivot(SF).to_pandas()
    wide = got.pivot(index="l_returnflag", columns="metric", values="value")
    # re-pivoting the melt restores one row per flag with both metrics
    assert set(wide.columns) == {"sum_qty", "sum_price_cents"}
    assert (wide > 0).all().all()


def test_chunk_tokens_known_doc():
    """Brute chunk boundaries on a crafted doc: 7 tokens, chunk 32,
    stride 24 -> one chunk; a 60-token doc -> chunks [0,32), [24,56),
    [48,60); empty text -> one chunk of the single empty token."""
    long_txt = " ".join(f"t{i}" for i in range(60))
    docs = pd.DataFrame({
        "doc_id": np.array([1, 2, 3], dtype=np.int64),
        "text": ["a b c d e f g", long_txt, ""],
        "lang": ["en"] * 3,
        "source": ["s"] * 3,
        "n_chars": np.array([13, len(long_txt), 0], dtype=np.int64),
    })
    got = (Q.q_chunk_tokens(_scratch_sf(documents=docs)).to_pandas()
           .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
    assert got.loc[got["doc_id"] == 1, "chunk_text"].tolist() == ["a b c d e f g"]
    d2 = got[got["doc_id"] == 2]
    toks = long_txt.split(" ")
    assert d2["chunk_text"].tolist() == [
        " ".join(toks[0:32]), " ".join(toks[24:56]), " ".join(toks[48:60])]
    assert d2["n_tokens"].tolist() == [32, 32, 12]
    d3 = got[got["doc_id"] == 3]
    assert d3["chunk_text"].tolist() == [""] and d3["n_tokens"].tolist() == [1]


def test_stopword_scrub_all_and_none():
    docs = pd.DataFrame({
        "doc_id": np.array([1, 2, 3], dtype=np.int64),
        "text": ["the a of and to", "cat dog", "the cat of the dog"],
        "lang": ["en"] * 3,
        "source": ["s"] * 3,
        "n_chars": np.array([15, 7, 18], dtype=np.int64),
    })
    got = (Q.q_stopword_scrub(_scratch_sf(documents=docs)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["clean_text"].tolist() == ["", "cat dog", "cat dog"]
    assert got["n_removed"].tolist() == [5, 0, 3]


def test_balanced_shards_matches_global_rank():
    """The histogram-offset decomposition equals a true global
    row_number over (n_tokens DESC, doc_id), including heavy ties."""
    rng = np.random.default_rng(5)
    n = 300
    toks = rng.integers(1, 9, n)  # few distinct lengths -> big ties
    docs = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": [" ".join(["w"] * int(k)) for k in toks],
        "lang": ["en"] * n,
        "source": ["s"] * n,
        "n_chars": np.array([2 * k - 1 for k in toks], dtype=np.int64),
    })
    got = (Q.q_balanced_shards(_scratch_sf(documents=docs)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    order = np.lexsort((docs["doc_id"].to_numpy(), -toks))
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n)
    assert got["shard"].tolist() == list(rank[docs["doc_id"]] % 8)
    # LPT round-robin balances token mass across shards
    per = pd.DataFrame({"s": got["shard"], "t": toks}).groupby("s")["t"].sum()
    assert per.max() - per.min() <= 8


def test_pack_bins_next_fit_invariants():
    """Recompute next-fit per partition: bins match exactly; capacity
    respected except single oversized docs; every doc packed once."""
    rng = np.random.default_rng(9)
    n = 200
    toks = rng.integers(1, 700, n)  # some docs exceed capacity 512
    docs = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": [" ".join(["w"] * int(k)) for k in toks],
        "lang": ["en"] * n,
        "source": ["s"] * n,
        "n_chars": np.zeros(n, dtype=np.int64),
    })
    got = (Q.q_pack_bins(_scratch_sf(documents=docs)).to_pandas()
           .sort_values(["part", "doc_id"]).reset_index(drop=True))
    assert len(got) == n and not got["doc_id"].duplicated().any()
    cap = 512
    for part, g in got.groupby("part"):
        w = g["n_tokens"].to_numpy()
        bins, b, cur = [], 0, 0
        for x in w:
            if cur > 0 and cur + x > cap:
                b, cur = b + 1, 0
            bins.append(b)
            cur += x
        assert g["bin"].tolist() == bins
    sums = got.groupby(["part", "bin"]).agg(s=("n_tokens", "sum"),
                                            c=("doc_id", "size"))
    assert ((sums["s"] <= cap) | (sums["c"] == 1)).all()


def test_event_entropy_uniform_and_single():
    """Uniform 4-type mix -> exactly 2.0 bits (2_000_000 e6); a
    single-type user -> exactly 0; term-wise rounding matches the
    brute per-type sum."""
    ts = pd.date_range("2024-01-01", periods=12, freq="1h").astype(
        "datetime64[us]")
    ev = pd.DataFrame({
        "event_id": np.arange(12, dtype=np.int64),
        "ts": ts,
        "user_id": np.array([1] * 8 + [2] * 4, dtype=np.int64),
        "event_type": ["a", "b", "c", "d"] * 2 + ["solo"] * 4,
        "value": np.zeros(12),
        "props": ["{}"] * 12,
    })
    got = (Q.q_event_entropy(_scratch_sf(events=ev)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    assert got["entropy_e6"].tolist() == [2_000_000, 0]
    assert got["n_types"].tolist() == [4, 1]


def test_quality_score_monotone_in_alpha():
    """More alpha mass (fewer spaces) at fixed length -> higher
    score; brute sigmoid agrees to the e6 rounding."""
    docs = pd.DataFrame({
        "doc_id": np.array([1, 2], dtype=np.int64),
        "text": ["abcdefgh", "a b c d "],
        "lang": ["en"] * 2,
        "source": ["s"] * 2,
        "n_chars": np.array([8, 8], dtype=np.int64),
    })
    got = (Q.q_quality_score(_scratch_sf(documents=docs)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    def brute(a, s, c):
        z = -2.0 + 0.01 * a + -0.005 * s + 0.002 * c
        return int(np.floor(1e6 / (1 + np.exp(-z)) + 0.5))
    assert got["score_e6"].tolist() == [brute(8, 0, 8), brute(4, 4, 8)]
    assert got.loc[0, "score_e6"] > got.loc[1, "score_e6"]


def test_histogram_clamps_and_counts():
    p = np.array([0.0, 24999.99, 25000.0, 499999.0, 500000.0, 9e9])
    orders = pd.DataFrame({
        "o_orderkey": np.arange(6, dtype=np.int64),
        "o_custkey": np.zeros(6, dtype=np.int64),
        "o_orderdate": pd.to_datetime(["2024-01-01"] * 6)
            .astype("datetime64[us]"),
        "o_totalprice": p,
    })
    got = (Q.q_histogram(_scratch_sf(orders=orders)).to_pandas()
           .sort_values("bucket").reset_index(drop=True))
    # bucket 0: two rows; bucket 1: the exact-boundary 25000; bucket
    # 19: everything >= 475k including the huge outlier (clamped)
    assert got.set_index("bucket")["n"].to_dict() == {0: 2, 1: 1, 19: 3}
    assert got.loc[got["bucket"] == 19, "sum_cents"].iloc[0] == \
        int(round(499999.0 * 100)) + int(round(500000.0 * 100)) + int(9e11)


def test_group_corr_exact_lines():
    """y = 3x exactly -> corr 1.000000; anti-correlated -> -1."""
    n = 50
    x = np.arange(1, n + 1, dtype=np.float64)
    li = pd.DataFrame({
        "l_returnflag": ["P"] * n + ["M"] * n,
        "l_quantity": np.concatenate([x, x]),
        "l_extendedprice": np.concatenate([3 * x, 3 * (n + 1 - x)]),
    })
    got = (Q.q_group_corr(_scratch_sf(lineitem=li)).to_pandas()
           .sort_values("l_returnflag").reset_index(drop=True))
    assert got["corr_e6"].tolist() == [-1000000, 1000000]
    assert got["n"].tolist() == [n, n]


def _empty_docs_sf() -> str:
    return _scratch_sf(documents=pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "text": pd.Series([], dtype="object"),
        "lang": pd.Series([], dtype="object"),
        "source": pd.Series([], dtype="object"),
        "n_chars": pd.Series([], dtype="int64"),
    }))


def test_todays_operators_empty_inputs():
    """Empty-input robustness for the chunk/scrub/shard/pack/score/
    entropy/histogram/corr wave: all return 0 rows, no crash."""
    import pyarrow as pa

    from oluray.stages import text as T

    et = pa.table({"doc_id": pa.array([], pa.int64()),
                   "text": pa.array([], pa.string())})
    assert T.chunk_tokens_batch(et, 32, 24).num_rows == 0
    assert T.stopword_scrub_batch(et, ("a",)).num_rows == 0

    d = _empty_docs_sf()
    assert len(Q.q_chunk_tokens(d).to_pandas()) == 0
    assert len(Q.q_stopword_scrub(d).to_pandas()) == 0
    assert len(Q.q_balanced_shards(d).to_pandas()) == 0
    assert len(Q.q_pack_bins(d).to_pandas()) == 0
    assert len(Q.q_quality_score(d).to_pandas()) == 0

    ev = _scratch_sf(events=pd.DataFrame({
        "event_id": pd.Series([], dtype="int64"),
        "ts": pd.Series([], dtype="datetime64[us]"),
        "user_id": pd.Series([], dtype="int64"),
        "event_type": pd.Series([], dtype="object"),
        "value": pd.Series([], dtype="float64"),
        "props": pd.Series([], dtype="object"),
    }))
    assert len(Q.q_event_entropy(ev).to_pandas()) == 0

    orders = _scratch_sf(orders=pd.DataFrame({
        "o_orderkey": pd.Series([], dtype="int64"),
        "o_custkey": pd.Series([], dtype="int64"),
        "o_orderdate": pd.Series([], dtype="datetime64[us]"),
        "o_totalprice": pd.Series([], dtype="float64"),
    }))
    assert len(Q.q_histogram(orders).to_pandas()) == 0

    li = _scratch_sf(lineitem=pd.DataFrame({
        "l_returnflag": pd.Series([], dtype="object"),
        "l_quantity": pd.Series([], dtype="float64"),
        "l_extendedprice": pd.Series([], dtype="float64"),
    }))
    assert len(Q.q_group_corr(li).to_pandas()) == 0
    assert len(Q.q_weighted_sample(d).to_pandas()) == 0


# ---------------------------------------------------------------------------
# wave: shipping_priority / user_mode / funnel_conv / basket_pairs
# ---------------------------------------------------------------------------


def test_pairs_within_groups_matches_itertools():
    """The vectorized per-segment pair generator vs itertools over a
    ragged random grouping (incl. singleton and empty-pair groups)."""
    import itertools

    rng = np.random.default_rng(5)
    rows = []
    for g in range(20):
        vals = rng.choice(1000, size=rng.integers(1, 9), replace=False)
        rows += [(g, int(v)) for v in vals]
    df = pd.DataFrame(rows, columns=["g", "v"])
    got = Q._pairs_within_groups(df, "g", "v")
    want = set()
    for g, sub in df.groupby("g"):
        for a, b in itertools.combinations(sorted(sub["v"]), 2):
            want.add((a, b))
    assert set(zip(got["pa"], got["pb"])) == want
    assert (got["pa"] < got["pb"]).all()
    # empty input
    empty = Q._pairs_within_groups(df.iloc[:0], "g", "v")
    assert len(empty) == 0


def test_user_mode_tie_breaks_lexicographic():
    df = pd.DataFrame({
        "event_id": np.arange(4, dtype=np.int64),
        "ts": pd.date_range("2024-01-01", periods=4, freq="1h")
                .astype("datetime64[us]"),
        "user_id": np.array([1, 1, 1, 1], dtype=np.int64),
        "event_type": ["view", "click", "click", "view"],  # tie 2-2
        "value": [0.0] * 4,
        "props": ["{}"] * 4,
    })
    got = Q.q_user_mode(_scratch_sf(events=df)).to_pandas()
    assert got["event_type"].tolist() == ["click"] and got["cnt"].tolist() == [2]


def test_funnel_conv_requires_strict_order():
    base = pd.Timestamp("2024-01-01")
    rows = []
    # user 1 converts; user 2 clicked before viewing; user 3 lacks purchase
    for uid, seq in [(1, [("view", 0), ("click", 1), ("purchase", 2)]),
                     (2, [("click", 0), ("view", 1), ("purchase", 2)]),
                     (3, [("view", 0), ("click", 1)])]:
        for et, h in seq:
            rows.append((len(rows), base + pd.Timedelta(hours=h), uid, et))
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    df["value"] = 0.0
    df["props"] = "{}"
    got = Q.q_funnel_conv(_scratch_sf(events=df)).to_pandas()
    assert got["user_id"].tolist() == [1]


def test_shipping_priority_ranks_by_integer_cents():
    got = Q.q_shipping_priority(SF).to_pandas()
    assert len(got) <= 10
    c = got["revenue_cents"].to_numpy()
    assert (np.diff(c) <= 0).all()
    assert str(got["revenue_cents"].dtype) == "int64"


# ---------------------------------------------------------------------------
# wave: lag_delta / late_order_counts / small_qty_revenue / set_intersect /
#       part_supplier_degree / status_cube / brand_size_skew
# ---------------------------------------------------------------------------


def _orders_df(rows):
    df = pd.DataFrame(rows, columns=["o_orderkey", "o_custkey",
                                     "o_orderdate", "o_totalprice"])
    df["o_orderkey"] = df["o_orderkey"].astype("int64")
    df["o_custkey"] = df["o_custkey"].astype("int64")
    df["o_orderdate"] = pd.to_datetime(df["o_orderdate"]).astype("datetime64[us]")
    return df


def test_lag_delta_per_customer_gaps():
    d = _scratch_sf(orders=_orders_df([
        (1, 7, "2024-01-01", 10.00),
        (2, 7, "2024-01-04", 12.50),   # +3 days, +250 cents
        (3, 7, "2024-01-04", 11.00),   # same-day tie -> key order, -150
        (4, 9, "2024-02-01", 5.00),    # lone first order: dropped
    ]))
    got = (Q.q_lag_delta(d).to_pandas()
           .sort_values("o_orderkey").reset_index(drop=True))
    assert got["o_orderkey"].tolist() == [2, 3]
    assert got["gap_days"].tolist() == [3, 0]
    assert got["price_delta_cents"].tolist() == [250, -150]
    # single-order customers contribute nothing
    assert 4 not in set(got["o_orderkey"])


def test_late_order_counts_exists_boundary():
    """>60 days strictly; an order qualifies once no matter how many
    late lineitems it has."""
    orders = _orders_df([
        (1, 1, "2024-01-01", 1.0),
        (2, 1, "2024-01-01", 1.0),
        (3, 1, "2024-01-01", 1.0),
    ])
    orders["o_orderpriority"] = ["1-URGENT", "1-URGENT", "5-LOW"]
    li = pd.DataFrame({
        "l_orderkey": np.array([1, 1, 2, 3], dtype=np.int64),
        # order 1: two late items (counted once); order 2: exactly 60
        # days (NOT late); order 3: 61 days (late)
        "l_shipdate": pd.to_datetime(
            ["2024-03-15", "2024-04-01", "2024-03-01", "2024-03-02"]
        ).astype("datetime64[us]"),
    })
    d = _scratch_sf(orders=orders[["o_orderkey", "o_orderdate",
                                   "o_orderpriority"]], lineitem=li)
    got = (Q.q_late_order_counts(d).to_pandas()
           .sort_values("o_orderpriority").reset_index(drop=True))
    assert got["o_orderpriority"].tolist() == ["1-URGENT", "5-LOW"]
    assert got["n"].tolist() == [1, 1]


def test_small_qty_revenue_strict_threshold():
    # part 10: quantities 1, 9 -> avg 5, 0.2*avg = 1.0; q=1 is NOT < 1.0
    # part 20: quantities 1, 99 -> avg 50, 0.2*avg = 10; q=1 qualifies
    li = pd.DataFrame({
        "l_partkey": np.array([10, 10, 20, 20], dtype=np.int64),
        "l_quantity": [1.0, 9.0, 1.0, 99.0],
        "l_extendedprice": [11.11, 1.0, 22.22, 1.0],
    })
    got = Q.q_small_qty_revenue(_scratch_sf(lineitem=li)).to_pandas()
    assert got["n"].tolist() == [1]
    assert got["revenue_cents"].tolist() == [2222]


def test_set_intersect_both_sides_required():
    ev = pd.DataFrame({
        "user_id": np.array([1, 1, 2, 3, 3, 4], dtype=np.int64),
        "event_type": ["click", "purchase", "click", "purchase",
                       "click", "view"],
    })
    got = Q.q_set_intersect(_scratch_sf(events=ev)).to_pandas()
    assert sorted(got["user_id"].tolist()) == [1, 3]


def test_part_supplier_degree_dedups_pairs():
    li = pd.DataFrame({
        "l_partkey": np.array([1, 1, 1, 2, 2, 3], dtype=np.int64),
        "l_suppkey": np.array([7, 7, 8, 9, 9, 7], dtype=np.int64),
    })  # part 1 -> deg 2; parts 2,3 -> deg 1
    got = (Q.q_part_supplier_degree(_scratch_sf(lineitem=li)).to_pandas()
           .sort_values("deg").reset_index(drop=True))
    assert got["deg"].tolist() == [1, 2]
    assert got["n_parts"].tolist() == [2, 1]


def test_status_cube_levels_consistent():
    got = Q.q_status_cube(SF).to_pandas()
    base = got[(got["status"] != "ALL") & (got["priority"] != "ALL")]
    for col, other in (("status", "priority"), ("priority", "status")):
        marg = got[(got[col] != "ALL") & (got[other] == "ALL")]
        want = base.groupby(col, as_index=False)[["rev_cents", "n"]].sum()
        m = marg.sort_values(col).reset_index(drop=True)
        w = want.sort_values(col).reset_index(drop=True)
        assert m["rev_cents"].tolist() == w["rev_cents"].tolist()
        assert m["n"].tolist() == w["n"].tolist()
    total = got[(got["status"] == "ALL") & (got["priority"] == "ALL")]
    assert total["n"].tolist() == [int(base["n"].sum())]
    assert total["rev_cents"].tolist() == [int(base["rev_cents"].sum())]


def test_brand_size_skew_symmetric_is_zero():
    part = pd.DataFrame({
        "p_brand": ["A"] * 5 + ["B"] * 4 + ["C"],
        "p_size": np.array([1, 2, 3, 4, 5,      # symmetric -> skew 0
                            1, 1, 1, 10,         # right-skewed -> > 0
                            7], dtype=np.int32),  # n=1 -> dropped
    })
    got = (Q.q_brand_size_skew(_scratch_sf(part=part)).to_pandas()
           .sort_values("p_brand").reset_index(drop=True))
    assert got["p_brand"].tolist() == ["A", "B"]
    assert got.loc[0, "skew_1e6"] == 0
    assert got.loc[1, "skew_1e6"] > 0
    # brute-force moment check for B
    s = np.array([1, 1, 1, 10], dtype=np.float64)
    m1, m2, m3 = s.mean(), (s * s).mean(), (s ** 3).mean()
    var = m2 - m1 * m1
    sk = (m3 - 3 * m1 * m2 + 2 * m1 ** 3) / (var * np.sqrt(var))
    assert got.loc[1, "skew_1e6"] == int(np.floor(abs(sk) * 1e6 + 0.5)) * (1 if sk > 0 else -1)


def test_wave4_empty_inputs():
    orders = _orders_df([]).iloc[:0]
    d = _scratch_sf(orders=orders)
    assert len(Q.q_lag_delta(d).to_pandas()) == 0

    li = pd.DataFrame({
        "l_partkey": pd.Series([], dtype="int64"),
        "l_quantity": pd.Series([], dtype="float64"),
        "l_extendedprice": pd.Series([], dtype="float64"),
        "l_suppkey": pd.Series([], dtype="int64"),
    })
    d2 = _scratch_sf(lineitem=li)
    got = Q.q_small_qty_revenue(d2).to_pandas()
    assert got["n"].tolist() == [0] and got["revenue_cents"].tolist() == [0]
    assert len(Q.q_part_supplier_degree(d2).to_pandas()) == 0

    ev = pd.DataFrame({
        "user_id": pd.Series([], dtype="int64"),
        "event_type": pd.Series([], dtype="object"),
    })
    assert len(Q.q_set_intersect(_scratch_sf(events=ev)).to_pandas()) == 0

    part = pd.DataFrame({
        "p_brand": pd.Series([], dtype="object"),
        "p_size": pd.Series([], dtype="int32"),
    })
    assert len(Q.q_brand_size_skew(_scratch_sf(part=part)).to_pandas()) == 0


def test_patch_extract_bytes_and_grid():
    """Patch rows must be exact pixel slices: drop-remainder grid,
    patch-major ordering, per-patch mean/std versus direct slicing."""
    import pyarrow as pa

    from oluray.functions import imagecodec
    from oluray.stages.image import PatchExtract

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (20, 27, 3), dtype=np.uint8)  # 2x3 grid of 8s + remainder
    tiny = rng.integers(0, 256, (5, 5, 3), dtype=np.uint8)  # < one patch
    batch = pa.table({
        "image_id": pa.array(["big", "tiny"]),
        "bytes": pa.array([imagecodec.encode_png(px),
                           imagecodec.encode_png(tiny)], pa.binary()),
        "fmt": pa.array(["png", "png"]),
    })
    out = PatchExtract(patch=8)(batch).to_pandas()
    assert (out["image_id"] == "big").all()  # tiny contributes nothing
    assert len(out) == 2 * 3
    for _, r in out.iterrows():
        want = px[r["py"] * 8:(r["py"] + 1) * 8, r["px"] * 8:(r["px"] + 1) * 8]
        got = np.frombuffer(r["patch"], dtype=np.uint8).reshape(8, 8, 3)
        np.testing.assert_array_equal(got, want)
        w = want.astype(np.float64).reshape(-1)
        assert abs(r["p_mean"] - round(w.mean(), 4)) < 1e-9
        assert abs(r["p_std"] - round(w.std(), 4)) < 1e-9
    # empty batch stays typed
    empty = PatchExtract(patch=8)(batch.slice(0, 0))
    assert empty.num_rows == 0 and "patch" in empty.column_names


def test_caption_pairs_gate_and_ids():
    d = _scratch_sf(documents=pd.DataFrame({
        "doc_id": np.array([1, 2], dtype=np.int64),
        "text": ["short text", " ".join(["tok"] * 40)],
    }))
    got = Q.q_caption_pairs(d).to_pandas()
    assert got["doc_id"].tolist() == [2]
    assert got["image_id"].tolist() == ["img00000002"]
    assert got["n_tok"].tolist() == [40]
    assert got["caption"].str.startswith("caption 2").all()


def test_fuzzy_pairs_ed1_matches_brute():
    """FastSS blocking + vectorized verify vs brute-force Levenshtein
    over a name pool with dupes, substitutions, indels, and misses."""
    import ray.data

    from oluray.stages.text import fuzzy_pairs_ed1

    names = ["cold widget", "cold widget", "cold widgex", "cold widge",
             "colds widget", "warm widget", "bolt", "bolt2", "xolt",
             "completely different", "a", "", "ab"]
    df = pd.DataFrame({"k": np.arange(len(names), dtype=np.int64),
                       "n": names})
    got = fuzzy_pairs_ed1(ray.data.from_pandas(df), "k", "n",
                          num_partitions=4).to_pandas()
    got_pairs = set(zip(got["ka"], got["kb"]))

    def lev(a, b):
        m, n = len(a), len(b)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (a[i - 1] != b[j - 1]))
        return d[n]

    want = {(i, j) for i in range(len(names)) for j in range(i + 1, len(names))
            if lev(names[i], names[j]) <= 1}
    assert got_pairs == want
    assert (got["ka"] < got["kb"]).all()


def test_unigram_logprob_tiny_corpus():
    """3-doc corpus with hand-computable unigram stats; repeated and
    multi-whitespace tokens, case folding."""
    d = _scratch_sf(documents=pd.DataFrame({
        "doc_id": np.array([1, 2, 3], dtype=np.int64),
        "text": ["The the  a", "b B", "a"],
    }))
    got = (Q.q_unigram_logprob(d).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # vocab: the x2, a x2, b x2 -> n=6; every token has p = 1/3
    import math
    u = int(math.floor(abs(math.log(2 / 6.0)) * 1e6 + 0.5)) * -1
    assert got["n_tok"].tolist() == [3, 2, 1]
    assert got["logprob_u6"].tolist() == [3 * u, 2 * u, u]


def test_wave5_empty_inputs():
    import ray.data

    from oluray.stages.text import fuzzy_pairs_ed1

    df = pd.DataFrame({"k": pd.Series([], dtype="int64"),
                       "n": pd.Series([], dtype="object")})
    assert len(fuzzy_pairs_ed1(ray.data.from_pandas(df), "k", "n",
                               num_partitions=2).to_pandas()) == 0

    d = _scratch_sf(documents=pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "text": pd.Series([], dtype="object"),
    }))
    assert len(Q.q_unigram_logprob(d).to_pandas()) == 0


def test_skyline2d_matches_brute():
    rng = np.random.default_rng(9)
    for trial in range(20):
        n = int(rng.integers(1, 60))
        price = rng.integers(0, 8, n).astype(np.float64)  # many ties
        size = rng.integers(0, 8, n).astype(np.int64)
        key = np.arange(n, dtype=np.int64)
        got = set(Q._skyline2d(price, size, key))
        want = set()
        for i in range(n):
            dominated = any(
                price[j] <= price[i] and size[j] >= size[i]
                and (price[j] < price[i] or size[j] > size[i])
                for j in range(n))
            if not dominated:
                want.add(i)
        assert got == want, trial
    assert len(Q._skyline2d(np.array([]), np.array([]),
                            np.array([], np.int64))) == 0


def test_skyline_local_prune_is_sound():
    """The global skyline must be identical no matter how the input
    is blocked (local-prune soundness)."""
    rng = np.random.default_rng(4)
    df = pd.DataFrame({
        "p_partkey": np.arange(400, dtype=np.int64),
        "p_retailprice": rng.integers(0, 50, 400).astype(np.float64),
        "p_size": rng.integers(1, 50, 400).astype(np.int32),
    })
    d = _scratch_sf(part=df)
    got = sorted(Q.q_part_skyline(d).to_pandas()["p_partkey"])
    idx = Q._skyline2d(df["p_retailprice"].to_numpy(),
                       df["p_size"].to_numpy(np.int64),
                       df["p_partkey"].to_numpy())
    assert got == sorted(df["p_partkey"].to_numpy()[idx])


def test_time_weighted_avg_known_sequence():
    base = pd.Timestamp("2024-01-01 00:00:00")
    ev = pd.DataFrame({
        "event_id": np.arange(4, dtype=np.int64),
        "user_id": np.array([1, 1, 1, 2], dtype=np.int64),
        "ts": pd.to_datetime([base, base + pd.Timedelta(seconds=10),
                              base + pd.Timedelta(seconds=25),
                              base]).astype("datetime64[us]"),
        "value": [2.0, 4.0, 99.0, 5.0],  # last-of-user weights 0
    })
    got = (Q.q_time_weighted_avg(_scratch_sf(events=ev)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    # user 1: 10s*200c + 15s*400c = 8000; dur 25. user 2: single event
    assert got["user_id"].tolist() == [1, 2]
    assert got["wsum"].tolist() == [8000, 0]
    assert got["wdur"].tolist() == [25, 0]


def test_radius_join_boundary_strict():
    """Pairs strictly inside the radius only; distance values match
    the haversine helper to the mm rounding."""
    got = Q.q_radius_join(SF).to_pandas()
    assert (got["dist_m"] < Q.RADIUS_M).all()
    # recompute one pair end-to-end
    r = got.iloc[0]
    lon, lat = geo.derive_lonlat(np.array([r["c_custkey"]], dtype=np.int64))
    f = dict((fid, (x, y)) for fid, x, y in Q.KNN_FEATURES)[r["feature_id"]]
    d = geo.haversine_m(lon, lat, np.array([f[0]]), np.array([f[1]]))[0]
    assert abs(round(d, 3) - r["dist_m"]) < 1e-9


def test_label_centroids_exact_sums():
    emb = pd.DataFrame({
        "label": np.array([1, 1, 2], dtype=np.int32),
        "embedding": [np.array([0.5, -0.25], np.float32),
                      np.array([1.5, 0.75], np.float32),
                      np.array([3.0, 0.0], np.float32)],
    })
    got = (Q.q_label_centroids(_scratch_sf(embeddings=emb)).to_pandas()
           .sort_values(["label", "dim"]).reset_index(drop=True))
    assert got["s_1e6"].tolist() == [2_000_000, 500_000, 3_000_000, 0]
    assert got["n"].tolist() == [2, 2, 1, 1]


def _scratch_dir(**tables):
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp()
    for name, df in tables.items():
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(d, f"{name}.parquet"))
    return d


def test_focal_mean_antimeridian_wrap():
    """Focal neighborhoods wrap in x: occupied cells on both sides of
    the antimeridian see each other. Brute-force 3x3 oracle."""
    got = Q.q_focal_mean(SF).to_pandas()
    # brute: decode, all-pairs adjacency with x wrap
    cell = got["cell"].to_numpy()
    n = got["n"].to_numpy()
    _, x, y = geo.cell_decode(cell)
    grid = 1 << Q.FOCAL_RES
    dx = np.abs(x[:, None] - x[None, :])
    dx = np.minimum(dx, grid - dx)  # wrap
    adj = (dx <= 1) & (np.abs(y[:, None] - y[None, :]) <= 1)
    fsum = (adj * n[None, :]).sum(axis=1)
    fn = adj.sum(axis=1)
    assert np.array_equal(got["focal_sum"].to_numpy(), fsum)
    assert np.array_equal(got["focal_n"].to_numpy(), fn)
    assert np.array_equal(got["focal_mean_e6"].to_numpy(),
                          fsum * 1_000_000 // fn)
    # seam coverage: the sf0.001 orders spread guarantees x=0 and
    # x=grid-1 are both occupied
    assert 0 in x and (grid - 1) in x


def test_bigram_pmi_crafted_docs():
    """PMI on a corpus tiny enough to hand-verify: 'a b' occurs 3x,
    unigrams a=4, b=4, total=10 tokens, 7 bigrams (4 + 2 + 1)."""
    docs = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["a b c a b", "a b x", "b a"],
    })
    d = _scratch_dir(documents=docs)
    got = Q.q_bigram_pmi(d).to_pandas().set_index(["w1", "w2"])
    # bigrams: (a,b)x3 (b,c) (c,a) (b,x) (b,a) -> only (a,b) survives n>=2
    assert set(got.index) == {("a", "b")}
    row = got.loc[("a", "b")]
    T, B, ca, cb, nab = 10.0, 7.0, 4.0, 4.0, 3.0
    want = round(np.log(nab * T * T / (B * ca * cb)) * 1e6)
    assert int(row["n_ab"]) == 3
    assert abs(int(row["pmi_u6"]) - want) <= 1


def test_min_price_supplier_tie_breaks():
    """Equal min prices pick the smaller supplier key; non-EUROPE
    suppliers never win even when cheaper."""
    lineitem = pd.DataFrame({
        "l_partkey": np.array([1, 1, 1, 2], dtype=np.int64),
        "l_suppkey": np.array([20, 10, 30, 10], dtype=np.int64),
        "l_extendedprice": [100.0, 100.0, 5.0, 70.0],
        "l_quantity": [2.0, 2.0, 1.0, 7.0],
    })
    supplier = pd.DataFrame({
        "s_suppkey": np.array([10, 20, 30], dtype=np.int64),
        "s_name": ["s10", "s20", "s30"],
        "s_nationkey": np.array([0, 0, 1], dtype=np.int64),
    })
    nation = pd.DataFrame({
        "n_nationkey": np.array([0, 1], dtype=np.int64),
        "n_name": ["GERMANY", "BRAZIL"],
        "n_regionkey": np.array([0, 1], dtype=np.int64),
    })
    region = pd.DataFrame({
        "r_regionkey": np.array([0, 1], dtype=np.int64),
        "r_name": ["EUROPE", "AMERICA"],
    })
    d = _scratch_dir(lineitem=lineitem, supplier=supplier,
                     nation=nation, region=region)
    got = (Q.q_min_price_supplier(d).to_pandas()
           .sort_values("p_partkey").reset_index(drop=True))
    # part 1: suppliers 10 and 20 tie at 5000 cents (supplier 30 is
    # cheaper but non-EUROPE) -> supplier 10 wins the tie
    assert got.loc[0, "p_partkey"] == 1 and got.loc[0, "s_suppkey"] == 10
    assert got.loc[0, "min_price_cents"] == 5000
    assert got.loc[1, "p_partkey"] == 2 and got.loc[1, "s_suppkey"] == 10
    assert len(got) == 2


def test_trending_types_topk_per_hour():
    got = Q.q_trending_types(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "event_type"])
    ev["hour"] = ev["ts"].dt.floor("h")
    c = ev.groupby(["hour", "event_type"], as_index=False).size()
    c = c.sort_values(["hour", "size", "event_type"],
                      ascending=[True, False, True], kind="mergesort")
    want = c.groupby("hour").head(3)
    pairs = set(zip(want["hour"], want["event_type"], want["size"]))
    assert set(zip(got["hour"], got["event_type"], got["n"])) == pairs
    assert (got.groupby("hour").size() <= 3).all()


def test_embed_outliers_brute():
    """Exact integer distance-to-centroid vs a brute float check on
    crafted embeddings with one planted outlier per label."""
    rng = np.random.default_rng(5)
    n, d = 40, 8
    emb = rng.normal(0, 0.05, (n, d)).astype(np.float32)
    emb[7] += 3.0   # planted outlier, label 7 % 2 = 1
    emb[12] -= 3.0  # planted outlier, label 12 % 2 = 0
    docs = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "label": (np.arange(n) % 2).astype(np.int32),
        "embedding": list(emb),
    })
    dpath = _scratch_dir(embeddings=docs)
    got = Q.q_embed_outliers(dpath).to_pandas()
    assert (got.groupby("label").size() == 5).all()
    # the planted outliers rank first in their labels
    top = got.sort_values(["label", "d2"], ascending=[True, False]) \
             .groupby("label").head(1)
    assert set(top["vec_id"]) == {7, 12}
    # exact d2 recheck for one row
    q = np.round(np.abs(emb.astype(np.float64) * 1000.0) + 0.5 - 0.5)  # placeholder
    q = (np.sign(emb.astype(np.float64) * 1000.0)
         * np.floor(np.abs(emb.astype(np.float64) * 1000.0) + 0.5)).astype(np.int64)
    for lab in (0, 1):
        m = docs["label"].to_numpy() == lab
        s = q[m].sum(axis=0)
        nn = int(m.sum())
        d2 = ((q[m] * nn - s) ** 2).sum(axis=1)
        ids = docs["vec_id"].to_numpy()[m]
        order = np.lexsort((ids, -d2))[:5]
        want = dict(zip(ids[order], d2[order]))
        sub = got[got["label"] == lab]
        assert dict(zip(sub["vec_id"], sub["d2"])) == want


def test_late_events_hand_case():
    """Permuted arrival order: the watermark is the running max over
    ARRIVAL order, and lateness is an exact microsecond delta."""
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    got = Q.q_late_events(SF).to_pandas()
    # brute force
    ev = ev.copy()
    ev["arr"] = (ev["event_id"].to_numpy().astype(np.uint64)
                 * np.uint64(2654435761)) % np.uint64(1 << 32)
    ev = ev.sort_values(["user_id", "arr", "event_id"])
    rows = {}
    for uid, g in ev.groupby("user_id"):
        wm = None
        for _, r in g.iterrows():
            if wm is not None and wm > r["ts"]:
                rows[int(r["event_id"])] = int(
                    (wm - r["ts"]).to_timedelta64().astype("timedelta64[us]")
                    .astype(np.int64))
            wm = r["ts"] if wm is None or r["ts"] > wm else wm
    assert dict(zip(got["event_id"], got["late_us"])) == rows
    assert len(got) > 0


def test_channel_stats_exact_moments():
    """Distributed per-channel moments == brute pixel-stack moments,
    bit-exact on the integer columns."""
    from oluray.functions import imagecodec
    from oluray.sources import fixtures

    got = Q.q_channel_stats(SF).to_pandas().sort_values("channel")
    imgs = Q._synth_images(SF).to_pandas()
    s1 = np.zeros(3, dtype=np.int64)
    s2 = np.zeros(3, dtype=np.int64)
    n = np.int64(0)
    for b, f in zip(imgs["bytes"], imgs["fmt"]):
        px = imagecodec.decode(b, f).astype(np.int64)
        s1 += px.sum(axis=(0, 1))
        s2 += (px * px).sum(axis=(0, 1))
        n += px.shape[0] * px.shape[1]
    assert got["n_pix"].tolist() == [n] * 3
    assert got["s1"].tolist() == s1.tolist()
    assert got["s2"].tolist() == s2.tolist()
    mean = s1 / n
    assert np.allclose(got["mean"].to_numpy(), mean, atol=1e-6)
    assert np.allclose(
        got["std"].to_numpy(),
        np.sqrt(s2 / n - mean * mean), atol=1e-6)


def test_pip_anti_complements_pip_join():
    """pip_anti ∪ pip_join's hit ids == all customers, disjointly —
    and every anti row really is outside every polygon (brute
    ray-cast per point)."""
    anti = Q.q_pip_anti(SF).to_pandas()
    hits = Q.q_pip_join(SF).to_pandas()
    cust = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"])
    anti_ids = set(anti["c_custkey"])
    hit_ids = set(hits["c_custkey"])
    assert anti_ids.isdisjoint(hit_ids)
    assert anti_ids | hit_ids == set(cust["c_custkey"])
    lon, lat = geo.derive_lonlat(anti["c_custkey"].to_numpy())
    for rx, ry in Q.PIP_POLYS.values():
        inside = geo.point_in_polygon(lon, lat, np.array(rx), np.array(ry))
        assert not inside.any()


def test_hash_split_deterministic_and_proportioned():
    got = Q.q_hash_split(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    assert len(got) == len(docs)
    ids = got["doc_id"].to_numpy(np.int64)
    expect = (ids * 2654435761) % 4294967296 % 1000
    assert (got["bucket"].to_numpy(np.int64) == expect).all()
    # rerun-identical (stable split is the operator's whole contract)
    again = Q.q_hash_split(SF).to_pandas().sort_values("doc_id")
    assert again.reset_index(drop=True).equals(
        got.sort_values("doc_id").reset_index(drop=True))
    frac_train = (got["split"] == "train").mean()
    assert 0.9 < frac_train <= 1.0


def test_first_last_events_brute():
    got = (Q.q_first_last_events(SF).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    f = ev.drop_duplicates("user_id", keep="first")
    l = ev.drop_duplicates("user_id", keep="last")
    n = ev.groupby("user_id", as_index=False).size()
    exp = (f[["user_id", "event_type"]]
           .rename(columns={"event_type": "first_type"})
           .merge(l[["user_id", "event_type"]]
                  .rename(columns={"event_type": "last_type"}), on="user_id")
           .merge(n.rename(columns={"size": "n_events"}), on="user_id")
           .sort_values("user_id").reset_index(drop=True))
    exp["n_events"] = exp["n_events"].astype("int64")
    assert got.equals(exp[got.columns.tolist()])


def test_rel_hull_brute():
    """Distributed per-relation hull == the same hull computed in one
    driver pass (verifies the grouping/shuffle; hull math itself is
    property-tested in test_geo)."""
    got = (Q.q_rel_hull(SF).to_pandas()
           .sort_values("o_orderkey").reset_index(drop=True))
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    li = li[li["l_orderkey"] % 50 == 0]
    lon, lat = geo.derive_lonlat(li["l_partkey"].to_numpy())

    def _rha(v):  # same half-away rounding as the query
        a = np.asarray(v, dtype=np.float64)
        return (np.sign(a) * np.floor(np.abs(a) + 0.5)).astype(np.int64)

    df = pd.DataFrame({"o_orderkey": li["l_orderkey"].to_numpy(),
                       "lon_e6": _rha(lon * 1e6), "lat_e6": _rha(lat * 1e6)})
    rows = []
    for ok, g in df.groupby("o_orderkey"):
        u = np.unique(np.stack([g["lon_e6"].to_numpy(np.int64),
                                g["lat_e6"].to_numpy(np.int64)], axis=1), axis=0)
        hx, hy = geo.convex_hull(u[:, 0].astype(np.float64),
                                 u[:, 1].astype(np.float64))
        hxi, hyi = hx.astype(np.int64), hy.astype(np.int64)
        area2 = int(np.sum(hxi * np.roll(hyi, -1) - np.roll(hxi, -1) * hyi)) \
            if len(hxi) >= 3 else 0
        rows.append((ok, len(g), len(u), len(hxi), abs(area2)))
    exp = pd.DataFrame(rows, columns=got.columns.tolist()).astype("int64")
    assert got.equals(exp.sort_values("o_orderkey").reset_index(drop=True))
    # sanity: hull never exceeds distinct points, area only with >=3
    assert (got["n_hull"] <= got["n_distinct"]).all()
    assert (got.loc[got["n_hull"] < 3, "area2_e12"] == 0).all()


def test_rect_join_brute_and_no_dup_pairs():
    """PBSM reference-point dedup: distributed rect join == brute
    O(n*m) intersection, with every pair formed exactly once."""
    got = (Q.q_rect_join(SF).to_pandas()
           .sort_values(["a_id", "b_id"]).reset_index(drop=True))
    assert not got.duplicated(["a_id", "b_id"]).any()

    def rects(path, key):
        df = pd.read_parquet(path, columns=[key])
        k = df[key].to_numpy(np.int64)
        lon, lat = geo.derive_lonlat(k)
        xc = np.sign(lon * 1e6) * np.floor(np.abs(lon * 1e6) + 0.5)
        yc = np.sign(lat * 1e6) * np.floor(np.abs(lat * 1e6) + 0.5)
        return pd.DataFrame({"id": k,
                             "xmin": xc.astype(np.int64) - (k % 7 + 1) * 100000,
                             "xmax": xc.astype(np.int64) + (k % 7 + 1) * 100000,
                             "ymin": yc.astype(np.int64) - (k % 5 + 1) * 100000,
                             "ymax": yc.astype(np.int64) + (k % 5 + 1) * 100000})

    A = rects(f"{SF}/customer.parquet", "c_custkey")
    B = rects(f"{SF}/supplier.parquet", "s_suppkey")
    m = A.merge(B, how="cross", suffixes=("_a", "_b"))
    ok = ((m["xmin_a"] <= m["xmax_b"]) & (m["xmin_b"] <= m["xmax_a"])
          & (m["ymin_a"] <= m["ymax_b"]) & (m["ymin_b"] <= m["ymax_a"]))
    m = m[ok]
    inter = ((np.minimum(m["xmax_a"], m["xmax_b"])
              - np.maximum(m["xmin_a"], m["xmin_b"]))
             * (np.minimum(m["ymax_a"], m["ymax_b"])
                - np.maximum(m["ymin_a"], m["ymin_b"]))).astype(np.int64)
    exp = (pd.DataFrame({"a_id": m["id_a"].to_numpy(),
                         "b_id": m["id_b"].to_numpy(),
                         "inter_area": inter})
           .sort_values(["a_id", "b_id"]).reset_index(drop=True))
    assert got.equals(exp)


def test_rect_join_cross_cell_pair():
    """A pair whose rects overlap across a grid-cell boundary is
    found once — the reference-point rule, not cell co-residence,
    owns the pair."""
    import ray.data as rd
    from oluray.stages import spatial as sp
    g = 1000
    a = rd.from_pandas(pd.DataFrame(
        {"id": [1], "xmin": [-2500], "xmax": [1500],
         "ymin": [-500], "ymax": [500]}))
    b = rd.from_pandas(pd.DataFrame(
        {"id": [7], "xmin": [900], "xmax": [3100],
         "ymin": [-100], "ymax": [2100]}))
    out = sp.rect_intersect_join(a, b, g, num_partitions=4).to_pandas()
    assert out.to_dict("records") == [
        {"a_id": 1, "b_id": 7, "inter_area": (1500 - 900) * (500 - (-100))}]


def test_nn_join_brute():
    got = (Q.q_nn_join(SF).to_pandas()
           .sort_values("a_id").reset_index(drop=True))
    cust = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"])
    sup = pd.read_parquet(f"{SF}/supplier.parquet", columns=["s_suppkey"])

    def xy(k):
        lon, lat = geo.derive_lonlat(k)
        r = lambda v: (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
        return r(lon * 1e6), r(lat * 1e6)

    ax, ay = xy(cust["c_custkey"].to_numpy(np.int64))
    bx, by = xy(sup["s_suppkey"].to_numpy(np.int64))
    bid = sup["s_suppkey"].to_numpy(np.int64)
    order = np.argsort(bid, kind="stable")  # tie-break by lower b id
    bx, by, bid = bx[order], by[order], bid[order]
    d2 = ((ax[:, None] - bx[None, :]) ** 2
          + (ay[:, None] - by[None, :]) ** 2)
    j = np.argmin(d2, axis=1)  # first min = lowest id on ties
    exp = pd.DataFrame({"a_id": cust["c_custkey"].to_numpy(np.int64),
                        "b_id": bid[j],
                        "d2": d2[np.arange(len(ax)), j]}) \
        .sort_values("a_id").reset_index(drop=True)
    assert len(got) == len(exp)
    assert got[["a_id", "b_id", "d2"]].equals(exp)


def test_nn_join_escalates_rounds_and_breaks_ties():
    """A lone faraway B forces multiple doubling rounds (round-1
    neighborhood is empty); equal-distance Bs resolve to the lower
    id — both the escalation loop and the oracle tie rule."""
    import ray.data as rd
    from oluray.stages import spatial as sp
    a = rd.from_pandas(pd.DataFrame(
        {"id": [1, 2], "x": [0, 1_000_000], "y": [0, 0]}))
    # B: one point 50e6 away (escalation), plus an exact tie pair
    # around A id 2 at distance 500_000 on each side
    b = rd.from_pandas(pd.DataFrame(
        {"id": [9, 5, 3], "x": [50_000_000, 500_000, 1_500_000],
         "y": [0, 0, 0]}))
    out = (sp.nn_join_planar(a, b, start_cell=10_000_000, num_partitions=4)
           .to_pandas().sort_values("a_id").reset_index(drop=True))
    assert out.loc[0].tolist() == [1, 5, 500_000 ** 2]
    assert out.loc[1].tolist() == [2, 3, 500_000 ** 2]  # tie -> lower id


def test_iqr_outliers_brute():
    got = (Q.q_iqr_outliers(SF).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    keep = np.zeros(len(ev), dtype=bool)
    for et, g in ev.groupby("event_type"):
        v = np.sort(g["value"].to_numpy(np.float64))
        n = len(v)
        q25 = v[int(np.floor(0.25 * (n - 1)))]
        q75 = v[int(np.floor(0.75 * (n - 1)))]
        lo, hi = q25 - 1.5 * (q75 - q25), q75 + 1.5 * (q75 - q25)
        keep[g.index] = (g["value"] < lo) | (g["value"] > hi)
    exp = ev[keep].sort_values("event_id").reset_index(drop=True)
    assert got.equals(exp[got.columns.tolist()])
    assert len(got) > 0  # the fixture data has outliers to flag


def test_retention_cohorts_brute():
    got = (Q.q_retention_cohorts(SF).to_pandas()
           .sort_values(["cohort_day", "offset_days"]).reset_index(drop=True))
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    f = ev.groupby("user_id")["ts"].min().dt.floor("D").rename("cohort_day")
    d = (pd.DataFrame({"user_id": ev["user_id"], "day": ev["ts"].dt.floor("D")})
         .drop_duplicates())
    j = d.join(f, on="user_id")
    j["offset_days"] = (j["day"] - j["cohort_day"]).dt.days.astype("int64")
    exp = (j.groupby(["cohort_day", "offset_days"], as_index=False).size()
           .rename(columns={"size": "n_users"})
           .sort_values(["cohort_day", "offset_days"]).reset_index(drop=True))
    exp["n_users"] = exp["n_users"].astype("int64")
    assert got.equals(exp[got.columns.tolist()])
    # day-0 row exists for every cohort (a user is active on their first day)
    day0 = set(exp.loc[exp["offset_days"] == 0, "cohort_day"])
    assert set(exp["cohort_day"]) == day0


def test_tile_mosaic_crc_brute():
    """Distributed mosaic == single-pass driver mosaic, crc-exact:
    same per-cell image pick (lowest ids), same grid layout."""
    import math
    import zlib
    from oluray.functions import imagecodec
    from oluray.sources import fixtures

    got = (Q.q_tile_mosaic(SF).to_pandas()
           .sort_values("cell").reset_index(drop=True))
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    ids = docs["doc_id"].to_numpy(np.int64)
    lon, lat = geo.derive_lonlat(ids)
    cells = geo.cell_encode(lon, lat, Q.MOSAIC_RES)
    t, k = Q.MOSAIC_T, Q.MOSAIC_K
    exp_rows = []
    df = pd.DataFrame({"i": ids, "cell": cells,
                       "image_id": [f"img{int(i):08d}" for i in ids]})
    for cell, g in df.groupby("cell"):
        g = g.sort_values("image_id")
        use = g.iloc[:k]
        side = int(math.ceil(math.sqrt(len(use))))
        canvas = np.zeros((side * t, side * t, 3), dtype=np.uint8)
        for j, i in enumerate(use["i"]):
            w = h = fixtures.SIZES[int(i) % len(fixtures.SIZES)]
            fmt = fixtures.FMTS[int(i) % len(fixtures.FMTS)]
            # decode what the engine decodes: the ENCODED blob (the
            # fake-jpeg path is deterministically lossy)
            px = imagecodec.decode(
                imagecodec.encode(fixtures._pixels(int(i), w, h, 42), fmt),
                fmt)
            ys = (np.arange(t) * h) // t
            xs = (np.arange(t) * w) // t
            th = px[ys][:, xs]
            r, c = divmod(j, side)
            canvas[r * t:(r + 1) * t, c * t:(c + 1) * t] = th
        exp_rows.append((int(cell), len(g), len(use),
                         np.int64(zlib.crc32(canvas.tobytes()))))
    exp = (pd.DataFrame(exp_rows,
                        columns=["cell", "n_images", "n_used", "crc"])
           .sort_values("cell").reset_index(drop=True))
    assert got[["cell", "n_images", "n_used", "crc"]].equals(exp)
    # the emitted PNG decodes back to the crc'd pixels (round-trip)
    px = imagecodec.decode_png(got.loc[0, "mosaic_png"])
    assert np.int64(zlib.crc32(px.tobytes())) == got.loc[0, "crc"]


def test_quadkeys_brute_and_prefix_property():
    got = (Q.q_quadkeys(SF).to_pandas()
           .sort_values("c_custkey").reset_index(drop=True))
    cust = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"])
    lon, lat = geo.derive_lonlat(cust["c_custkey"].to_numpy(np.int64))
    cells = geo.cell_encode(lon, lat, Q.CELL_RES)
    m = geo.morton_code(cells)
    exp = ["".join(str((int(v) >> (2 * (Q.CELL_RES - 1 - i))) & 3)
                   for i in range(Q.CELL_RES)) for v in m]
    exp_sorted = [q for _, q in sorted(zip(cust["c_custkey"], exp))]
    assert got["quadkey"].tolist() == exp_sorted
    # zoom prefix: the parent cell's quadkey is the child's minus one digit
    par = geo.cell_parent(cells, Q.CELL_RES - 1)
    mp = geo.morton_code(par)
    exp_p = ["".join(str((int(v) >> (2 * (Q.CELL_RES - 2 - i))) & 3)
                     for i in range(Q.CELL_RES - 1)) for v in mp]
    assert all(c[:-1] == p for c, p in zip(exp, exp_p))


def test_geofence_transitions_brute():
    got = (Q.q_geofence_transitions(SF).to_pandas()
           .sort_values(["user_id", "event_id"]).reset_index(drop=True))
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    lon, lat = geo.derive_lonlat(ev["event_id"].to_numpy())
    inside = np.zeros(len(ev), dtype=bool)
    for rx, ry in Q.PIP_POLYS.values():
        inside |= geo.point_in_polygon(lon, lat, np.array(rx), np.array(ry))
    ev = ev.assign(inside=inside).sort_values(
        ["user_id", "ts", "event_id"]).reset_index(drop=True)
    rows = []
    for uid, g in ev.groupby("user_id"):
        st = g["inside"].to_numpy()
        for i in range(1, len(g)):
            if st[i] != st[i - 1]:
                rows.append((uid, g["event_id"].iloc[i],
                             "enter" if st[i] else "exit"))
    exp = pd.DataFrame(rows, columns=["user_id", "event_id", "op"]).sort_values(
        ["user_id", "event_id"]).reset_index(drop=True)
    assert len(got) > 0  # fixture actually exercises both ops
    assert set(got["op"]) == {"enter", "exit"}
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_heavy_terms_exact_vs_brute_and_blocksize_invariance():
    import ray
    import ray.data

    from oluray.stages import text as T

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    toks = docs["text"].str.lower().str.split(r"[^a-z]+", regex=True).explode()
    toks = toks[toks.notna() & (toks != "")]
    vc = toks.value_counts()
    total = int(vc.sum())
    exp = vc[vc * Q.HEAVY_K >= total].sort_index()
    got = (Q.q_heavy_terms(SF).to_pandas()
           .sort_values("term").reset_index(drop=True))
    assert got["term"].tolist() == exp.index.tolist()
    assert got["cnt"].tolist() == exp.to_list()
    # candidate-superset guarantee must hold at ANY block granularity:
    # re-run with pathologically small blocks (many tiny MG sketches)
    tiny = ray.data.from_pandas(docs).repartition(40)
    got2 = (T.heavy_terms(tiny, k=Q.HEAVY_K, num_partitions=4).to_pandas()
            .sort_values("term").reset_index(drop=True))
    assert got2["term"].tolist() == exp.index.tolist()
    assert got2["cnt"].tolist() == exp.to_list()


def test_geohash_brute_and_prefix_property():
    got = (Q.q_geohash(SF).to_pandas()
           .sort_values("c_custkey").reset_index(drop=True))
    cust = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"])
    lon, lat = geo.derive_lonlat(cust["c_custkey"].to_numpy(np.int64))

    def ref_geohash(lo: float, la: float, chars: int) -> str:
        # textbook bisection formulation (independent of the bit-
        # interleave arithmetic the engine uses)
        lo_r, la_r = [-180.0, 180.0], [-90.0, 90.0]
        bits, out, even = 0, [], True
        alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
        acc = 0
        while len(out) < chars:
            if even:
                mid = (lo_r[0] + lo_r[1]) / 2
                if lo >= mid:
                    acc = acc * 2 + 1
                    lo_r[0] = mid
                else:
                    acc *= 2
                    lo_r[1] = mid
            else:
                mid = (la_r[0] + la_r[1]) / 2
                if la >= mid:
                    acc = acc * 2 + 1
                    la_r[0] = mid
                else:
                    acc *= 2
                    la_r[1] = mid
            even = not even
            bits += 1
            if bits == 5:
                out.append(alpha[acc])
                bits, acc = 0, 0
        return "".join(out)

    order = np.argsort(cust["c_custkey"].to_numpy())
    sample = order[::7]  # bisection reference is per-point Python
    for i in sample:
        row = got[got["c_custkey"] == cust["c_custkey"].iloc[i]]
        assert row["geohash"].iloc[0] == ref_geohash(
            lon[i], lat[i], Q.GEOHASH_CHARS), (lon[i], lat[i])


def test_pagerank_brute_and_block_invariance():
    import ray
    import ray.data

    from oluray.stages import joins as J

    # small directed graph incl. a chain, a hub, and a dangling node
    edges = pd.DataFrame({
        "src": [1, 2, 3, 4, 5, 1, 2, 6, 7],
        "dst": [2, 3, 4, 5, 1, 3, 1, 1, 6],
    })
    scale, dn, dd_, iters = 10**9, 85, 100, 7
    base = scale * (dd_ - dn) // dd_

    def brute() -> dict[int, int]:
        nodes = sorted(set(edges["src"]) | set(edges["dst"]))
        out: dict[int, list[int]] = {}
        for s, d in zip(edges["src"], edges["dst"]):
            out.setdefault(s, []).append(d)
        r = {n: scale for n in nodes}
        for _ in range(iters):
            nxt = {n: base for n in nodes}
            for s, ds in out.items():
                c = (r[s] * dn) // dd_ // len(ds)
                for d in ds:
                    nxt[d] += c
            r = nxt
        return r

    exp = brute()
    for blocks in (1, 5):
        ds = ray.data.from_pandas(edges).repartition(blocks)
        got = J.pagerank(ds, iters=iters, scale=scale,
                         num_partitions=4).to_pandas()
        gm = dict(zip(got["node"], got["r"]))
        assert gm == exp, f"blocks={blocks}"


def test_pagerank_overflow_bound_raises():
    """The int64 bound (|nodes| * scale * damp_num < 2^63) is enforced,
    not left as a caller contract — numpy would wrap silently and
    return wrong ranks with no error (ADVICE r3)."""
    import pytest
    import ray.data

    from oluray.stages import joins as J

    edges = pd.DataFrame({"src": [1, 2, 3], "dst": [2, 3, 1]})
    ds = ray.data.from_pandas(edges)
    with pytest.raises(ValueError, match="scale<="):
        J.pagerank(ds, iters=1, scale=2**61, num_partitions=2)
    # a compliant scale still works on the same input
    out = J.pagerank(ds, iters=1, scale=10**6,
                     num_partitions=2).to_pandas()
    assert len(out) == 3


def test_od_matrix_brute():
    got = (Q.q_od_matrix(SF).to_pandas()
           .sort_values(["o_cell", "d_cell"]).reset_index(drop=True))
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    g = ev.groupby("user_id").agg(o=("event_id", "first"),
                                  d=("event_id", "last"))
    olon, olat = geo.derive_lonlat(g["o"].to_numpy(np.int64))
    dlon, dlat = geo.derive_lonlat(g["d"].to_numpy(np.int64))
    exp = (pd.DataFrame({"o_cell": geo.cell_encode(olon, olat, Q.CELL_RES),
                         "d_cell": geo.cell_encode(dlon, dlat, Q.CELL_RES)})
           .groupby(["o_cell", "d_cell"], as_index=False).size()
           .rename(columns={"size": "n_users"})
           .sort_values(["o_cell", "d_cell"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert int(got["n_users"].sum()) == ev["user_id"].nunique()


def test_zscore_norm_moments():
    got = Q.q_zscore_norm(SF).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber",
                                  "l_returnflag", "l_extendedprice"])
    assert len(got) == len(li)
    # brute per-row expectation (bigint stats, same formula); compare
    # as multisets — (l_orderkey, l_linenumber) is NOT unique in the
    # synthetic lineitem, so no keyed merge
    cents = np.sign(li["l_extendedprice"].to_numpy() * 100.0) * np.floor(
        np.abs(li["l_extendedprice"].to_numpy() * 100.0) + 0.5)
    li = li.assign(c=cents.astype(np.int64))
    exp_rows = []
    for _, g in li.groupby("l_returnflag"):
        n = len(g)
        s = int(g["c"].sum())
        s2 = int((g["c"].astype(object) ** 2).sum())
        d = float(n * s2 - s * s) ** 0.5
        z = (g["c"].to_numpy(np.float64) * float(n) - float(s)) / d
        exp_rows.append(pd.DataFrame(
            {"l_orderkey": g["l_orderkey"], "l_linenumber": g["l_linenumber"],
             "z_1e6": (np.sign(z) * np.floor(np.abs(z * 1e6) + 0.5)
                       ).astype(np.int64),
             "zf": z}))
    exp = pd.concat(exp_rows)
    key = ["l_orderkey", "l_linenumber", "z_1e6"]
    gs = got.sort_values(key).reset_index(drop=True)
    es = exp[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(gs, es, check_dtype=False)
    # normalized: mean ~0, population var ~1 overall per flag
    zz = exp["zf"].to_numpy()
    assert np.isfinite(zz).all()
    assert abs(zz.mean()) < 1e-6 and abs(zz.std() - 1.0) < 1e-3


def test_triangle_count_brute():
    got = (Q.q_triangle_count(SF).to_pandas()
           .sort_values("node").reset_index(drop=True))
    e = Q._interaction_edges(SF).to_pandas()
    canon = set()
    for a, b in zip(e["a"], e["b"]):
        canon.add((min(a, b), max(a, b)))
    nodes = sorted({x for p in canon for x in p})
    cnt: dict[int, int] = {}
    import itertools
    for x, y, z in itertools.combinations(nodes, 3):
        if {(x, y), (y, z), (x, z)} <= canon:
            for n in (x, y, z):
                cnt[n] = cnt.get(n, 0) + 1
    exp = (pd.DataFrame({"node": list(cnt), "n_tri": list(cnt.values())})
           .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_bfs_hops_long_chain_and_brute():
    import ray
    import ray.data

    from oluray.stages import joins as J

    # chain 0-1-2-...-9 plus a branch: needs one round PER hop — a
    # chain longer than any single round's reach
    edges = pd.DataFrame({"src": [0, 1, 2, 3, 4, 5, 6, 7, 8, 3],
                          "dst": [1, 2, 3, 4, 5, 6, 7, 8, 9, 100]})
    seeds = pd.DataFrame({"node": [0]})
    got = J.bfs_hops(ray.data.from_pandas(edges).repartition(3),
                     ray.data.from_pandas(seeds), max_hops=6,
                     num_partitions=4).to_pandas()
    gm = dict(zip(got["node"], got["hop"]))
    exp = {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 6, 100: 4}
    assert gm == exp  # 7,8,9 are beyond max_hops and absent
    # catalog query agrees with per-node Dijkstra-ish brute force
    cat = Q.q_bfs_hops(SF).to_pandas()
    e = Q._interaction_edges(SF).to_pandas()
    adj: dict[int, set[int]] = {}
    for a, b in zip(e["a"], e["b"]):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seeds2 = sorted(n for n in adj if n % Q.BFS_SEED_MOD == 0)
    hop = {n: 0 for n in seeds2}
    frontier = set(seeds2)
    for h in range(1, Q.BFS_MAX_HOPS + 1):
        nxt = {m for n in frontier for m in adj[n]} - hop.keys()
        for m in nxt:
            hop[m] = h
        frontier = nxt
    assert dict(zip(cat["node"], cat["hop"])) == hop


def test_chi2_lang_source_brute():
    got = (Q.q_chi2_lang_source(SF)
           .sort_values(["lang", "source"]).reset_index(drop=True))
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["lang", "source"])
    obs = docs.groupby(["lang", "source"], as_index=False).size()
    n = len(docs)
    rt = docs.groupby("lang").size()
    ct = docs.groupby("source").size()
    rows = []
    for _, r in obs.iterrows():
        o, l, s = int(r["size"]), r["lang"], r["source"]
        e = rt[l] * ct[s] / n
        rows.append((l, s, o, (o - e) ** 2 / e))
    exp = pd.DataFrame(rows, columns=["lang", "source", "o", "chi2"]) \
        .sort_values(["lang", "source"]).reset_index(drop=True)
    assert got["o"].tolist() == exp["o"].tolist()
    np.testing.assert_allclose(got["chi2_1e6"].to_numpy() / 1e6,
                               exp["chi2"].to_numpy(), rtol=1e-6, atol=2e-6)


def test_track_speed_brute():
    got = (Q.q_track_speed(SF).to_pandas()
           .sort_values(["user_id", "event_id"]).reset_index(drop=True))
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    ev = ev.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    lon, lat = geo.derive_lonlat(ev["event_id"].to_numpy(np.int64))
    rows = []
    for i in range(1, len(ev)):
        if ev["user_id"].iloc[i] != ev["user_id"].iloc[i - 1]:
            continue
        # date_diff('second', a, b) counts boundary crossings ==
        # floor-each-epoch-then-subtract (NOT truncation of the delta)
        dt = (int(ev["ts"].iloc[i].value // 10**9)
              - int(ev["ts"].iloc[i - 1].value // 10**9))
        if dt <= 0:
            continue
        d = float(geo.haversine_m(np.array([lon[i - 1]]), np.array([lat[i - 1]]),
                                  np.array([lon[i]]), np.array([lat[i]]))[0])
        mm = int(np.sign(d) * np.floor(abs(d * 1000.0) + 0.5))
        rows.append((ev["user_id"].iloc[i], ev["event_id"].iloc[i],
                     mm, dt, mm * 1000 // dt))
    exp = pd.DataFrame(rows, columns=["user_id", "event_id", "dist_mm",
                                      "dt_s", "speed_um_s"]) \
        .sort_values(["user_id", "event_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_bpe_merges_matches_pure_python():
    got = Q.q_bpe_merges(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    toks = (docs["text"].str.lower()
            .str.split(r"[^a-z]+", regex=True).explode())
    toks = toks[toks.notna() & (toks != "")]
    vocab = {w: int(f) for w, f in toks.value_counts().items()}
    syms = {w: list(w) for w in vocab}
    exp = []
    for rank in range(8):
        pc_: dict[tuple[str, str], int] = {}
        for w, f in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc_[(s[i], s[i + 1])] = pc_.get((s[i], s[i + 1]), 0) + f
        if not pc_:
            break
        # max count, lexicographic tie-break
        best = min(pc_.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, r), c = best
        exp.append((rank, l, r, c))
        for w in syms:
            s = syms[w]
            res, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    res.append(l + r)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            syms[w] = res
    expdf = pd.DataFrame(exp, columns=["rank", "left", "right", "pair_count"])
    pd.testing.assert_frame_equal(got, expdf, check_dtype=False)
    # merges are real bigrams: each learned pair occurred in the corpus
    assert (got["pair_count"] > 0).all()


def test_grid_clusters_brute():
    got = (Q.q_grid_clusters(SF).to_pandas()
           .sort_values("c_custkey").reset_index(drop=True))
    cust = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"])
    lon, lat = geo.derive_lonlat(cust["c_custkey"].to_numpy(np.int64))
    cells = geo.cell_encode(lon, lat, Q.GRID_RES)
    vc = pd.Series(cells).value_counts()
    core = sorted(vc[vc >= Q.GRID_MINPTS].index)
    # brute union-find over 8-adjacency (x wraps, y clamps = k_ring)
    idx = {c: i for i, c in enumerate(core)}
    parent = list(range(len(core)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    n = 1 << Q.GRID_RES
    _, xs, ys = geo.cell_decode(np.array(core))
    pos = {(int(a), int(b)): i for i, (a, b) in enumerate(zip(xs, ys))}
    for i, (a, b) in enumerate(zip(xs, ys)):
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                j = pos.get(((int(a) + dx) % n,
                             min(max(int(b) + dy, 0), n - 1)))
                if j is not None:
                    parent[find(i)] = find(j)
    label = {c: core[min(find(idx[d]) for d in core
                         if find(idx[d]) == find(idx[c]))]
             for c in core}
    # min cell id of component
    comp_min: dict[int, int] = {}
    for c in core:
        r = find(idx[c])
        comp_min[r] = min(comp_min.get(r, c), c)
    rows = []
    for k, cell in zip(cust["c_custkey"], cells):
        if cell in idx:
            rows.append((k, cell, comp_min[find(idx[cell])]))
    exp = (pd.DataFrame(rows, columns=["c_custkey", "cell", "label"])
           .sort_values("c_custkey").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got["label"].nunique() < len(core)  # adjacency actually merged


def test_weighted_median_brute():
    got = (Q.q_weighted_median(SF).to_pandas()
           .sort_values("l_returnflag").reset_index(drop=True))
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice",
                                  "l_quantity"])
    cents = (np.sign(li["l_extendedprice"]) * np.floor(
        np.abs(li["l_extendedprice"] * 100.0) + 0.5)).astype(np.int64)
    w = (np.sign(li["l_quantity"]) * np.floor(
        np.abs(li["l_quantity"]) + 0.5)).astype(np.int64)
    rows = []
    for f, g in pd.DataFrame({"f": li["l_returnflag"], "c": cents,
                              "w": w}).groupby("f"):
        g = g.sort_values("c")
        cum = g["w"].cumsum()
        tot = int(g["w"].sum())
        rows.append((f, int(g["c"][cum * 2 >= tot].iloc[0])))
    exp = pd.DataFrame(rows, columns=["l_returnflag", "wmedian_cents"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_gap_fill_brute():
    got = (Q.q_gap_fill(SF).to_pandas()
           .sort_values(["event_type", "hour_idx"]).reset_index(drop=True))
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts"])
    h = (ev["ts"].astype("int64") // 3_600_000_000).astype("int64")
    c = (pd.DataFrame({"t": ev["event_type"], "h": h})
         .groupby(["t", "h"], as_index=False).size())
    h0, h1 = int(h.min()), int(h.max())
    types = sorted(ev["event_type"].unique())
    full = pd.MultiIndex.from_product(
        [types, range(h0, h1 + 1)], names=["t", "h"]).to_frame(index=False)
    exp = full.merge(c, on=["t", "h"], how="left")
    exp["size"] = exp["size"].fillna(0).astype("int64")
    exp.columns = ["event_type", "hour_idx", "n"]
    exp = exp.sort_values(["event_type", "hour_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # the spine actually fills: zero rows exist
    assert (got["n"] == 0).any()
    assert len(got) == len(types) * (h1 - h0 + 1)


def test_trimmed_stats_brute():
    got = (Q.q_trimmed_stats(SF).to_pandas()
           .sort_values("l_returnflag").reset_index(drop=True))
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice"])
    cents = (np.sign(li["l_extendedprice"]) * np.floor(
        np.abs(li["l_extendedprice"] * 100.0) + 0.5)).astype(np.int64)
    rows = []
    for f, g in pd.DataFrame({"f": li["l_returnflag"],
                              "c": cents}).groupby("f"):
        v = np.sort(g["c"].to_numpy())
        n = len(v)
        lo = v[int(np.floor(0.10 * (n - 1)))]
        hi = v[int(np.floor(0.90 * (n - 1)))]
        kept = g["c"][(g["c"] >= lo) & (g["c"] <= hi)]
        rows.append((f, len(kept), int(kept.sum())))
    exp = pd.DataFrame(rows, columns=["l_returnflag", "n_kept", "sum_cents"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_simplify_tracks_brute_and_error_bound():
    got = (Q.q_simplify_tracks(SF).to_pandas()
           .sort_values(["user_id", "event_id"]).reset_index(drop=True))
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    rows = []
    for uid, g in ev.groupby("user_id"):
        lon, lat = geo.derive_lonlat(g["event_id"].to_numpy(np.int64))
        keep = geo.simplify_ring(lon, lat, Q.SIMPLIFY_EPS_DEG)
        for e in g["event_id"].to_numpy()[keep]:
            rows.append((uid, e))
    exp = (pd.DataFrame(rows, columns=["user_id", "event_id"])
           .sort_values(["user_id", "event_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # it actually simplifies, and endpoints always survive
    assert len(got) < len(ev)
    fl = ev.groupby("user_id")["event_id"]
    for e in fl.first():
        assert e in set(got["event_id"])


def test_track_corridor_brute():
    got = (Q.q_track_corridor(SF).to_pandas()
           .sort_values(["user_id", "cell"]).reset_index(drop=True))
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id"])
    lon, lat = geo.derive_lonlat(ev["event_id"].to_numpy(np.int64))
    cells = geo.cell_encode(lon, lat, Q.CORRIDOR_RES)
    nb = geo.k_ring(cells, Q.CORRIDOR_K)
    exp = (pd.DataFrame({"user_id": np.repeat(ev["user_id"].to_numpy(),
                                              nb.shape[1]),
                         "cell": nb.ravel()})
           .drop_duplicates().sort_values(["user_id", "cell"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # the corridor strictly contains the raw track cells
    raw = set(zip(ev["user_id"], cells))
    assert raw < set(zip(got["user_id"], got["cell"]))


def test_resample_tracks_brute():
    got = (Q.q_resample_tracks(SF).to_pandas()
           .sort_values(["user_id", "hour_idx"]).reset_index(drop=True))
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    ev = ev.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    lon, lat = geo.derive_lonlat(ev["event_id"].to_numpy(np.int64))
    rows = []
    for i in range(1, len(ev)):
        if ev["user_id"].iloc[i] != ev["user_id"].iloc[i - 1]:
            continue
        t0 = int(ev["ts"].iloc[i - 1].value // 10**9)
        t1 = int(ev["ts"].iloc[i].value // 10**9)
        if t1 <= t0:
            continue
        for idx in range(t0 // 3600 + 1, t1 // 3600 + 1):
            frac = (idx * 3600 - t0) / (t1 - t0)
            li = lon[i - 1] + (lon[i] - lon[i - 1]) * frac
            la = lat[i - 1] + (lat[i] - lat[i - 1]) * frac
            rows.append((ev["user_id"].iloc[i], idx,
                         int(np.sign(li) * np.floor(abs(li * 1e6) + 0.5)),
                         int(np.sign(la) * np.floor(abs(la * 1e6) + 0.5))))
    exp = (pd.DataFrame(rows, columns=["user_id", "hour_idx",
                                       "lon_1e6", "lat_1e6"])
           .sort_values(["user_id", "hour_idx"]).reset_index(drop=True))
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # interpolant stays inside the segment's bounding box
    assert got["lon_1e6"].between(int(lon.min() * 1e6) - 1,
                                  int(lon.max() * 1e6) + 1).all()


def test_mad_outliers_brute():
    got = (Q.q_mad_outliers(SF).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    rows = []
    for et, g in ev.groupby("event_type"):
        v = np.sort(g["value"].to_numpy(np.float64))
        med = v[int(np.floor(0.5 * (len(v) - 1)))]
        d = np.sort(np.abs(g["value"].to_numpy(np.float64) - med))
        mad = d[int(np.floor(0.5 * (len(d) - 1)))]
        f = g[np.abs(g["value"] - med) > 3.0 * mad]
        rows.append(f)
    exp = (pd.concat(rows).sort_values("event_id")
           .reset_index(drop=True)[["event_id", "event_type", "value"]])
    assert 0 < len(got) < len(ev)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_entity_clusters_brute():
    got = (Q.q_entity_clusters(SF).to_pandas()
           .sort_values("p_partkey").reset_index(drop=True))
    part = pd.read_parquet(f"{SF}/part.parquet",
                           columns=["p_partkey", "p_name"])
    # brute ED<=1 union-find
    def ed1(a: str, b: str) -> bool:
        if a == b:
            return True
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) <= 1
        if la > lb:
            a, b, la, lb = b, a, lb, la
        i = j = diff = 0
        while i < la and j < lb:
            if a[i] != b[j]:
                diff += 1
                if diff > 1:
                    return False
                j += 1
            else:
                i += 1
                j += 1
        return True

    keys = part["p_partkey"].tolist()
    names = part["p_name"].tolist()
    parent = {k: k for k in keys}

    def find(k):
        while parent[k] != k:
            parent[k] = parent[parent[k]]
            k = parent[k]
        return k

    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            if ed1(names[i], names[j]):
                parent[find(keys[i])] = find(keys[j])
    comp_min: dict[int, int] = {}
    for k in keys:
        r = find(k)
        comp_min[r] = min(comp_min.get(r, k), k)
    exp = (pd.DataFrame({"p_partkey": keys,
                         "entity": [comp_min[find(k)] for k in keys]})
           .sort_values("p_partkey").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got["entity"].nunique() < len(got)  # real merging happened


def test_attribution_brute():
    got = (Q.q_attribution(SF).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])
    ev = ev[ev["event_type"].isin(["click", "purchase"])]
    ev = ev.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    rows = []
    for uid, g in ev.groupby("user_id"):
        last_ts = None
        for _, r in g.iterrows():
            if r["event_type"] == "purchase" and last_ts is not None:
                gap = int(r["ts"].value // 1000) - int(last_ts.value // 1000)
                if gap <= Q.ATTRIB_WINDOW_US:
                    clicks = g[(g["event_type"] == "click")
                               & (g["ts"] == last_ts)]
                    rows.append((r["event_id"],
                                 int(clicks["event_id"].max()), gap))
            if r["event_type"] == "click":
                last_ts = r["ts"]
    exp = (pd.DataFrame(rows, columns=["event_id", "click_event_id",
                                       "gap_us"])
           .sort_values("event_id").reset_index(drop=True))
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_triangle_count_shuffle_path_matches_broadcast_path():
    """Force the beyond-broadcast fallback (hash-partitioned wedge
    join + string-pair-key semi join) with broadcast_rows=0 and check
    it returns exactly the broadcast path's answer."""
    e = Q._interaction_edges(SF)
    fast = (Q._triangle_counts(e, num_partitions=4).to_pandas()
            .sort_values("node").reset_index(drop=True))
    e2 = Q._interaction_edges(SF)
    slow = (Q._triangle_counts(e2, num_partitions=4, broadcast_rows=0)
            .to_pandas().sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(fast, slow)
    assert len(fast) > 0


def test_hist_equalize_bit_exact_vs_numpy_oracle():
    got = Q.q_hist_equalize(SF).to_pandas()
    assert len(got) > 0
    # pick one image; recompute the textbook equalization and compare
    # the re-decoded pixels bit-for-bit
    import ray
    import ray.data

    from oluray.functions import imagecodec
    from oluray.stages.image import HistEqualize

    img = Q._synth_images(SF).limit(3).to_pandas()
    import pyarrow as pa
    out = HistEqualize()(pa.Table.from_pandas(img)).to_pandas()
    for i in range(len(img)):
        px = imagecodec.decode(img["bytes"].iloc[i], img["fmt"].iloc[i])
        exp = np.empty_like(px)
        for ch in range(px.shape[2]):
            v = px[..., ch]
            hist = np.bincount(v.ravel(), minlength=256)
            cdf = np.cumsum(hist)
            nz = np.flatnonzero(hist)
            cdf_min = int(cdf[nz[0]]) if len(nz) else 0
            denom = max(int(cdf[-1]) - cdf_min, 1)
            lut = np.floor((cdf - cdf_min) * 255 / denom + 0.5).astype(np.uint8)
            exp[..., ch] = lut[v]
        dec = imagecodec.decode_png(out["png"].iloc[i])
        np.testing.assert_array_equal(dec, exp)
    # equalization stretches contrast on the synthetic gradients
    assert (got["contrast_after"] >= got["contrast_before"] - 1e-9).mean() > 0.8


def test_join_size_query_bound():
    got = Q.q_join_size(SF)
    orders = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey"])
    cust = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"])
    true = orders.merge(cust, left_on="o_custkey",
                        right_on="c_custkey").shape[0]
    assert int(got["estimate"].iloc[0]) >= true
    assert int(got["estimate"].iloc[0]) <= int(true * 1.05) + 16


def test_decayed_cells_brute():
    got = (Q.q_decayed_cells(SF).to_pandas()
           .sort_values("cell").reset_index(drop=True))
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "ts", "value"])
    lon, lat = geo.derive_lonlat(ev["event_id"].to_numpy(np.int64))
    cell = geo.cell_encode(lon, lat, Q.TILE_RES)
    cents = (np.sign(ev["value"]) * np.floor(
        np.abs(ev["value"] * 100.0) + 0.5)).astype(np.int64)
    hrs = (ev["ts"].astype("int64") // 3_600_000_000).to_numpy()
    age = np.minimum((hrs.max() - hrs) // Q.DECAY_HALFLIFE_H, 62)
    w = cents >> age
    exp = (pd.DataFrame({"cell": cell, "w": w})
           .groupby("cell", as_index=False)["w"].sum()
           .sort_values("cell").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # decay actually bites: total decayed mass < raw mass
    assert got["w"].sum() < cents.sum()


def test_group_linreg_brute():
    got = (Q.q_group_linreg(SF)
           .sort_values("l_returnflag").reset_index(drop=True))
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity",
                                  "l_extendedprice"])
    x = (np.sign(li["l_quantity"]) * np.floor(
        np.abs(li["l_quantity"]) + 0.5)).astype(np.int64)
    y = (np.sign(li["l_extendedprice"]) * np.floor(
        np.abs(li["l_extendedprice"] * 100.0) + 0.5)).astype(np.int64)
    for _, r in got.iterrows():
        g = li["l_returnflag"] == r["l_returnflag"]
        xs, ys = x[g].astype(np.float64), y[g].astype(np.float64)
        slope, icept = np.polyfit(xs, ys, 1)
        assert abs(r["slope_1e9"] / 1e9 - slope) < 1e-4 * max(abs(slope), 1)
        assert abs(r["icept_1e3"] / 1e3 - icept) < 1e-4 * max(abs(icept), 1)


def test_markov_transitions_brute():
    got = (Q.q_markov_transitions(SF).to_pandas()
           .sort_values(["prev_type", "next_type"]).reset_index(drop=True))
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    rows = []
    for _, g in ev.groupby("user_id"):
        et = g["event_type"].tolist()
        rows += list(zip(et[:-1], et[1:]))
    c = (pd.DataFrame(rows, columns=["prev_type", "next_type"])
         .groupby(["prev_type", "next_type"], as_index=False).size()
         .rename(columns={"size": "cnt"}))
    tot = c.groupby("prev_type")["cnt"].transform("sum")
    c["p_1e9"] = (np.sign(c["cnt"]) * np.floor(
        np.abs(c["cnt"] / tot * 1e9) + 0.5)).astype(np.int64)
    exp = c.sort_values(["prev_type", "next_type"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # each row's probabilities sum to ~1
    s = got.groupby("prev_type")["p_1e9"].sum()
    assert ((s - 10**9).abs() <= 5).all()


def test_item_sim_brute():
    got = (Q.q_item_sim(SF).to_pandas().reset_index(drop=True))
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"]).drop_duplicates()
    from collections import Counter
    item_orders: dict[int, set] = {}
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        item_orders.setdefault(p, set()).add(o)
    pair_cnt: Counter = Counter()
    for o, g in li.groupby("l_orderkey"):
        ps = sorted(g["l_partkey"])
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_cnt[(ps[i], ps[j])] += 1
    rows = []
    for (a, b), c in pair_cnt.items():
        u = len(item_orders[a]) + len(item_orders[b]) - c
        jac = int(np.floor(abs(c / u * 1e9) + 0.5))
        rows.append((a, b, c, jac))
    exp = (pd.DataFrame(rows, columns=["pa", "pb", "cnt", "jac_1e9"])
           .sort_values(["jac_1e9", "pa", "pb"],
                        ascending=[False, True, True])
           .head(100).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_snap_to_segment_brute():
    got = (Q.q_snap_to_segment(SF).to_pandas()
           .sort_values("c_custkey").reset_index(drop=True))
    cust = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"])
    lon, lat = geo.derive_lonlat(cust["c_custkey"].to_numpy(np.int64))
    segs = Q._segments()
    rows = []
    for k, px, py in zip(cust["c_custkey"], lon, lat):
        best = None
        for sid, x1, y1, x2, y2 in segs:
            dx, dy = x2 - x1, y2 - y1
            t = ((px - x1) * dx + (py - y1) * dy) / (dx * dx + dy * dy)
            t = min(max(t, 0.0), 1.0)
            cx, cy = x1 + t * dx, y1 + t * dy
            d2 = (px - cx) ** 2 + (py - cy) ** 2
            r = int(np.sign(d2) * np.floor(abs(d2 * 1e9) + 0.5))
            if best is None or (r, sid) < best:
                best = (r, sid)
        rows.append((k, best[1], best[0]))
    exp = (pd.DataFrame(rows, columns=["c_custkey", "seg_id", "d2_1e9"])
           .sort_values("c_custkey").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # every segment id is valid and multiple segments actually win
    assert set(got["seg_id"]) <= {s[0] for s in segs}
    assert got["seg_id"].nunique() > 1


def test_flow_field_brute():
    got = (Q.q_flow_field(SF).to_pandas()
           .sort_values("cell").reset_index(drop=True))
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    ev = ev.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    lon, lat = geo.derive_lonlat(ev["event_id"].to_numpy(np.int64))
    uid = ev["user_id"].to_numpy()
    same = uid[1:] == uid[:-1]
    cell = geo.cell_encode(lon[:-1][same], lat[:-1][same], Q.TILE_RES)
    r = lambda x: (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
    g = pd.DataFrame({"cell": cell,
                      "dlon": r((lon[1:][same] - lon[:-1][same]) * 1e6),
                      "dlat": r((lat[1:][same] - lat[:-1][same]) * 1e6)})
    exp = g.groupby("cell", as_index=False).agg(
        n=("dlon", "size"), sdlon_1e6=("dlon", "sum"),
        sdlat_1e6=("dlat", "sum")).sort_values("cell").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert int(got["n"].sum()) == int(same.sum())


def test_session_paths_brute():
    got = Q.q_session_paths(SF).to_pandas().reset_index(drop=True)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    from collections import Counter
    c: Counter = Counter()
    for _, g in ev.groupby("user_id"):
        et = g["event_type"].tolist()
        for i in range(len(et) - 2):
            c[(et[i], et[i + 1], et[i + 2])] += 1
    exp = (pd.DataFrame([(a, b, d, n) for (a, b, d), n in c.items()],
                        columns=["t1", "t2", "t3", "cnt"])
           .sort_values(["cnt", "t1", "t2", "t3"],
                        ascending=[False, True, True, True])
           .head(50).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_pushdown_scan_brute_and_filters_rows():
    got = (Q.q_pushdown_scan(SF).to_pandas()
           .sort_values("l_returnflag").reset_index(drop=True))
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice",
                                  "l_shipdate"])
    lo = pd.Timestamp(Q.PUSHDOWN_LO)
    hi = pd.Timestamp(Q.PUSHDOWN_HI + " 23:59:59.999999")
    m = li[(li["l_shipdate"] >= lo) & (li["l_shipdate"] <= hi)]
    cents = (np.sign(m["l_extendedprice"]) * np.floor(
        np.abs(m["l_extendedprice"] * 100.0) + 0.5)).astype(np.int64)
    exp = (pd.DataFrame({"l_returnflag": m["l_returnflag"], "c": cents})
           .groupby("l_returnflag", as_index=False)
           .agg(n=("c", "size"), rev_cents=("c", "sum"))
           .sort_values("l_returnflag").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # the filter actually prunes: fewer rows than the full table
    assert int(got["n"].sum()) < len(li)
    assert int(got["n"].sum()) == len(m) > 0


def test_flow_rose_brute_and_octant_geometry():
    got = (Q.q_flow_rose(SF).to_pandas()
           .sort_values(["cell", "octant"]).reset_index(drop=True))
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    ev = ev.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    lon, lat = geo.derive_lonlat(ev["event_id"].to_numpy(np.int64))
    uid = ev["user_id"].to_numpy()
    same = uid[1:] == uid[:-1]
    r = lambda x: (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
    cell = geo.cell_encode(lon[:-1][same], lat[:-1][same], Q.TILE_RES)
    dx = r((lon[1:][same] - lon[:-1][same]) * 1e6)
    dy = r((lat[1:][same] - lat[:-1][same]) * 1e6)
    rows = []
    for c, x, y in zip(cell, dx, dy):
        if x == 0 and y == 0:
            continue
        # reference octant from the true angle, with the SAME tie
        # convention (axes and 45-deg diagonals resolved by the
        # integer rule): check containment instead of equality on
        # exact boundaries
        rows.append((c, x, y))
    df = pd.DataFrame(rows, columns=["cell", "dx", "dy"])
    ax, ay = df["dx"].abs(), df["dy"].abs()
    oct_int = np.where(
        df["dy"] >= 0,
        np.where(df["dx"] > 0, np.where(ay <= ax, 0, 1),
                 np.where(ax < ay, 2, 3)),
        np.where(df["dx"] < 0, np.where(ay <= ax, 4, 5),
                 np.where(ax < ay, 6, 7))).astype(np.int64)
    # angular correctness off boundaries: the true angle lies inside
    # the claimed 45-degree sector (boundaries excluded from check)
    ang = np.degrees(np.arctan2(df["dy"], df["dx"])) % 360.0
    off_boundary = np.abs(ang % 45.0) > 1e-6
    sec = (ang // 45.0).astype(np.int64)
    assert (oct_int[off_boundary] == sec[off_boundary]).all()
    exp = (pd.DataFrame({"cell": df["cell"], "octant": oct_int})
           .groupby(["cell", "octant"], as_index=False).size()
           .rename(columns={"size": "n"})
           .sort_values(["cell", "octant"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_radius_gyration_brute():
    got = (Q.q_radius_gyration(SF).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id"])
    lon, lat = geo.derive_lonlat(ev["event_id"].to_numpy(np.int64))
    r = lambda v: (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
    x, y = r(lon * 1e6), r(lat * 1e6)
    rows = []
    for uid, g in pd.DataFrame({"u": ev["user_id"], "x": x,
                                "y": y}).groupby("u"):
        n = len(g)
        # definitional check: mean squared distance from the centroid
        cx, cy = g["x"].mean(), g["y"].mean()
        rog = float(np.sqrt(((g["x"] - cx) ** 2
                             + (g["y"] - cy) ** 2).mean()))
        rows.append((uid, n, rog))
    exp = pd.DataFrame(rows, columns=["user_id", "n", "rog"]) \
        .sort_values("user_id").reset_index(drop=True)
    assert got["n"].tolist() == exp["n"].tolist()
    # moments form == definitional form (up to the 1e-6-deg rounding)
    np.testing.assert_allclose(got["rog_1e6"].to_numpy(np.float64),
                               exp["rog"].to_numpy(), rtol=1e-9, atol=0.51)


def test_r4_new_queries_match_duckdb():
    """r4 wave (ref_index_owners / store_lookup / idw_interpolate):
    oracle-exact at sf0.001 — the driver gate runs them at sf0.01,
    this keeps the contract under pytest too."""
    import duckdb

    con = duckdb.connect()
    for t in ("customer", "part", "orders", "lineitem", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    for name in ("ref_index_owners", "store_lookup", "idw_interpolate"):
        got = Q.QUERIES[name](SF).to_pandas()
        exp = con.sql(Q.ORACLE[name]).df()
        cols = sorted(got.columns)
        gs = got[cols].sort_values(cols).reset_index(drop=True)
        es = exp[sorted(exp.columns)][cols].sort_values(cols).reset_index(
            drop=True)
        assert gs.shape == es.shape, name
        assert (gs.astype(str).values == es.astype(str).values).all(), name
