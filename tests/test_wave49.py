"""Wave-49 checks: LZ78 vs an independent parser + known sequences,
MEC containment/support properties + brute O(n^3) cross-check."""
import numpy as np
import pandas as pd

from oluray.pipelines import queries_wave49 as W

SF = "/root/testdata/sf0.001"


def test_lz78_known():
    # classic: a b ab ba (4 phrases), trailing partial counts once
    assert W.lz78_phrases(list("ababab")) == 4  # a, b, ab, ab(partial)
    assert W.lz78_phrases([]) == 0
    assert W.lz78_phrases(["x"]) == 1
    assert W.lz78_phrases(list("aaaa")) == 3  # a, aa, a(partial)


def _brute_lz78(seq):
    d, out, cur = set(), 0, ""
    for ch in seq:
        cur += "\x00" + ch
        if cur not in d:
            d.add(cur)
            out += 1
            cur = ""
    return out + (1 if cur else 0)


def test_lz_real_vs_brute():
    import duckdb

    ev = duckdb.sql(
        f"SELECT user_id, event_type, ts, event_id FROM "
        f"read_parquet('{SF}/events.parquet') "
        f"ORDER BY user_id, ts, event_id").df()
    got = W.QUERIES["lz_complexity"](SF).to_pandas() \
        .set_index("user_id")
    for uid, sub in list(ev.groupby("user_id"))[:25]:
        exp = _brute_lz78(sub["event_type"].tolist())
        assert int(got.loc[int(uid), "lz_phrases"]) == exp
        assert int(got.loc[int(uid), "n_events"]) == len(sub)


def test_mec_properties():
    """Every purchase point is inside (tolerance), and the radius is
    tight: some point sits on the boundary."""
    import duckdb

    from oluray.functions import geo

    keys = duckdb.sql(
        f"SELECT event_id FROM read_parquet('{SF}/events.parquet') "
        f"WHERE event_type = 'purchase'").df()["event_id"] \
        .to_numpy(np.int64)
    lon, lat = geo.derive_lonlat(keys)
    got = W.QUERIES["enclosing_circle"](SF).to_pandas().iloc[0]
    cx, cy, r2 = float(got["cx"]), float(got["cy"]), float(got["r2"])
    d2 = (lon - cx) ** 2 + (lat - cy) ** 2
    assert (d2 <= r2 * (1 + 1e-9) + 1e-6).all()
    # tight: max distance is the radius (support point on boundary)
    assert abs(float(d2.max()) - r2) <= 1e-6 * max(r2, 1.0)
    assert int(got["n_hull"]) >= 3


def test_mec_kernel_brute():
    """Welzl on random small sets vs brute O(n^3) minimal circle."""
    rng = np.random.default_rng(17)

    def brute(xs, ys):
        n = len(xs)
        best = None
        cands = []
        for i in range(n):
            for j in range(i + 1, n):
                cands.append(W._circle_two(xs[i], ys[i], xs[j], ys[j]))
                for k in range(j + 1, n):
                    c3 = W._circle_three(xs[i], ys[i], xs[j], ys[j],
                                         xs[k], ys[k])
                    if c3 is not None:
                        cands.append(c3)
        for c in cands:
            if all(W._in_circle(c, xs[m], ys[m], 1e-9)
                   for m in range(n)):
                if best is None or c[2] < best[2]:
                    best = c
        return best

    for _ in range(10):
        n = int(rng.integers(2, 12))
        xs = rng.uniform(-50, 50, n)
        ys = rng.uniform(-50, 50, n)
        got = W.welzl_mec(xs, ys)
        exp = brute(xs.tolist(), ys.tolist())
        assert abs(got[2] - exp[2]) <= 1e-6 * max(1.0, exp[2])
