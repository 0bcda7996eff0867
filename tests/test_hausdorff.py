"""Brute-force checks for the trajectory symmetric-Hausdorff
self-join (`spatial.hausdorff_self_join`): ragged random tracks vs an
all-pairs numpy re-derivation, an explicit antimeridian-straddling
pair (the envelope prefilter must wrap, plain lon intervals don't),
and near-pole tracks (worst-case lon dilation). The oracle-backed
catalog entry (`track_hausdorff`) is also covered by the driver
gate."""
import numpy as np
import pandas as pd
import ray.data

from oluray.functions import geo
from oluray.stages import spatial


def _brute(tracks: dict[int, tuple[np.ndarray, np.ndarray]],
           tau_m: float) -> pd.DataFrame:
    rows = []
    ids = sorted(tracks)
    tau_mm = int(np.floor(tau_m * 1000.0 + 0.5))
    for i, u in enumerate(ids):
        for v in ids[i + 1:]:
            la, pa_ = tracks[u]
            lb, pb = tracks[v]
            d = geo.haversine_m(la[:, None], pa_[:, None],
                                lb[None, :], pb[None, :])
            h = max(d.min(axis=1).max(), d.min(axis=0).max())
            mm = int(np.floor(abs(h) * 1000.0 + 0.5))
            if mm <= tau_mm:
                rows.append((u, v, mm))
    return (pd.DataFrame(rows, columns=["u1", "u2", "haus_mm"])
            .astype("int64"))


def _run(tracks: dict[int, tuple[np.ndarray, np.ndarray]],
         tau_m: float, **kw) -> pd.DataFrame:
    ds = ray.data.from_items(
        [{"tid": k, "lons": lon.tolist(), "lats": lat.tolist()}
         for k, (lon, lat) in sorted(tracks.items())])
    out = spatial.hausdorff_self_join(ds, tau_m, id_col="tid",
                                      num_partitions=4, **kw).to_pandas()
    return out.astype("int64")


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (df.sort_values(["u1", "u2"]).reset_index(drop=True)
            [["u1", "u2", "haus_mm"]])


def test_hausdorff_matches_brute_ragged(ray_session):
    rng = np.random.default_rng(7)
    tracks = {}
    # three loose clusters + isolated singletons, ragged lengths 1..6
    centers = [(-60.0, 10.0), (-59.0, 11.0), (120.0, -30.0)]
    tid = 0
    for cx, cy in centers:
        for _ in range(5):
            n = int(rng.integers(1, 7))
            tracks[tid] = (cx + rng.uniform(-2, 2, n),
                           cy + rng.uniform(-2, 2, n))
            tid += 1
    tracks[tid] = (np.array([0.0]), np.array([0.0]))
    tau = 400_000.0  # 400 km
    got = _norm(_run(tracks, tau))
    exp = _norm(_brute(tracks, tau))
    assert got.equals(exp)
    assert len(exp) > 0  # the threshold actually selects pairs


def test_hausdorff_antimeridian_pair(ray_session):
    # two tracks 0.4 deg of lon apart ACROSS the dateline: unwrapped
    # lon intervals are 359.6 deg apart, the true distance ~44 km
    tracks = {
        1: (np.array([-179.9, -179.8]), np.array([10.0, 10.1])),
        2: (np.array([179.9, 179.7]), np.array([10.0, 10.2])),
        3: (np.array([0.0, 0.1]), np.array([10.0, 10.1])),  # far away
    }
    tau = 100_000.0  # 100 km
    got = _norm(_run(tracks, tau))
    exp = _norm(_brute(tracks, tau))
    assert got.equals(exp)
    assert got["u1"].tolist() == [1] and got["u2"].tolist() == [2]


def test_hausdorff_near_pole(ray_session):
    # |lat| ~ 84.9: lon dilation is ~11x the equatorial one; two
    # tracks 20 deg of lon apart up there are only ~200 km apart
    tracks = {
        1: (np.array([10.0, 11.0]), np.array([84.8, 84.9])),
        2: (np.array([30.0, 29.0]), np.array([84.8, 84.9])),
        4: (np.array([10.0, 11.0]), np.array([60.0, 60.1])),
    }
    tau = 400_000.0
    got = _norm(_run(tracks, tau))
    exp = _norm(_brute(tracks, tau))
    assert got.equals(exp)
    assert (1, 2) in set(zip(got["u1"], got["u2"]))


def test_hausdorff_asymmetric_directions(ray_session):
    # B is a superset-shaped cloud around A: h(A,B) is small but
    # h(B,A) is large — the SYMMETRIC result must use the max
    a_lon = np.array([0.0, 0.05])
    a_lat = np.array([0.0, 0.05])
    b_lon = np.array([0.0, 0.05, 3.0])   # one far outlier point
    b_lat = np.array([0.0, 0.05, 0.0])
    tracks = {1: (a_lon, a_lat), 2: (b_lon, b_lat)}
    exp = _brute(tracks, 1e9)  # huge tau: keep the pair
    got = _run(tracks, 1e9)
    assert _norm(got).equals(_norm(exp))
    # the outlier drives H to ~330 km, far above h(A,B)
    assert got["haus_mm"].iloc[0] > 300_000_000


def _brute_frechet(tracks: dict[int, tuple[np.ndarray, np.ndarray]],
                   tau_m: float) -> pd.DataFrame:
    """Pure-Python reference DP (scalar, no shared code with the
    vectorized kernel)."""
    rows = []
    ids = sorted(tracks)
    tau_mm = int(np.floor(tau_m * 1000.0 + 0.5))
    for i, u in enumerate(ids):
        for v in ids[i + 1:]:
            la, pa_ = tracks[u]
            lb, pb = tracks[v]
            na, nb = len(la), len(lb)
            d = geo.haversine_m(la[:, None], pa_[:, None],
                                lb[None, :], pb[None, :])
            dp = [[None] * nb for _ in range(na)]
            for a in range(na):
                for b in range(nb):
                    if a == 0 and b == 0:
                        prev = d[0, 0]
                    elif a == 0:
                        prev = dp[0][b - 1]
                    elif b == 0:
                        prev = dp[a - 1][0]
                    else:
                        prev = min(dp[a - 1][b], dp[a][b - 1],
                                   dp[a - 1][b - 1])
                    dp[a][b] = max(float(d[a, b]), float(prev))
            mm = int(np.floor(abs(dp[na - 1][nb - 1]) * 1000.0 + 0.5))
            if mm <= tau_mm:
                rows.append((u, v, mm))
    return (pd.DataFrame(rows, columns=["u1", "u2", "frechet_mm"])
            .astype("int64"))


def _run_frechet(tracks, tau_m, **kw) -> pd.DataFrame:
    ds = ray.data.from_items(
        [{"tid": k, "lons": lon.tolist(), "lats": lat.tolist()}
         for k, (lon, lat) in sorted(tracks.items())])
    out = spatial.frechet_self_join(ds, tau_m, id_col="tid",
                                    num_partitions=4, **kw).to_pandas()
    return out.astype("int64")


def test_frechet_matches_brute_ragged(ray_session):
    rng = np.random.default_rng(11)
    tracks = {}
    tid = 0
    for cx, cy in [(-60.0, 10.0), (-59.5, 10.5), (120.0, -30.0)]:
        for _ in range(4):
            n = int(rng.integers(1, 7))
            tracks[tid] = (cx + rng.uniform(-2, 2, n),
                           cy + rng.uniform(-2, 2, n))
            tid += 1
    tau = 600_000.0
    got = (_run_frechet(tracks, tau)
           .sort_values(["u1", "u2"]).reset_index(drop=True))
    exp = (_brute_frechet(tracks, tau)
           .sort_values(["u1", "u2"]).reset_index(drop=True))
    assert got.equals(exp)
    assert len(exp) > 0


def test_frechet_order_aware_vs_hausdorff(ray_session):
    # same street walked in OPPOSITE directions: Hausdorff ~ 0 but
    # the coupling must cross the whole track -> Frechet ~ track span
    lon = np.linspace(0.0, 1.0, 8)
    lat = np.zeros(8)
    tracks = {1: (lon, lat), 2: (lon[::-1].copy(), lat)}
    tau = 50_000.0  # 50 km: Hausdorff-close, Frechet-far (~111 km)
    h = _run(tracks, tau)
    f = _run_frechet(tracks, tau)
    assert len(h) == 1 and h["haus_mm"].iloc[0] == 0
    assert len(f) == 0
    # at a tau above the span the pair appears with the span distance
    f2 = _run_frechet(tracks, 200_000.0)
    exp = _brute_frechet(tracks, 200_000.0)
    assert f2.astype("int64").equals(exp)
    assert f2["frechet_mm"].iloc[0] > 100_000_000  # > 100 km
