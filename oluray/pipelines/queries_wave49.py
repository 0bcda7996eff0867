"""Wave-49 catalog: Lempel-Ziv sequence complexity and the minimal
enclosing circle.

`lz_complexity` is the LZ78 phrase count of each user's event-type
sequence — the behavioral-complexity / compressibility measure
(low = routine-bound user, high = erratic): parse the (ts,
event_id)-ordered type string into the incremental LZ78 dictionary
and count phrases. Exact integer; per-user partition, sequences are
per-user-sized. Rows-only (an incremental dictionary parse is not
SQL); brute-verified against an independent parser.

`enclosing_circle` is the minimal enclosing circle (facility
coverage radius) of the purchase-event point cloud — a HOLISTIC
geometric aggregate made scale-shaped by the hull trick: the MEC is
determined by the convex hull, per-block partial hulls shrink the
corpus to an aggregate-sized candidate set (`geo.convex_hull`
per block, hull-of-hulls at the end), and deterministic Welzl
(fixed processing order, no RNG) runs on that tiny set. Rows-only;
verified by the containment + support-point properties.
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from oluray.functions import geo
from oluray.stages import joins


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# lz_complexity — LZ78 phrase count per user
# ---------------------------------------------------------------------------


def lz78_phrases(symbols) -> int:
    """Number of LZ78 phrases of the sequence (final partial phrase
    counts as one)."""
    d = {}
    phrases = 0
    cur = ()
    for s in symbols:
        cur = cur + (s,)
        if cur not in d:
            d[cur] = True
            phrases += 1
            cur = ()
    if cur:
        phrases += 1
    return phrases


def q_lz_complexity(sf_dir: str):
    """(user_id, n_events, lz_phrases) over (ts, event_id)-ordered
    event-type sequences."""
    ev = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "event_type"])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        rows = []
        for uid, sub in df.groupby("user_id", sort=False):
            seq = sub["event_type"].tolist()
            rows.append((int(uid), len(seq), lz78_phrases(seq)))
        return pd.DataFrame(rows, columns=["user_id", "n_events",
                                           "lz_phrases"])

    return joins.partitioned_map(ev, ["user_id"], per_user,
                                 num_partitions=8)


# ---------------------------------------------------------------------------
# enclosing_circle — MEC of purchase points via hull-of-hulls
# ---------------------------------------------------------------------------


def _circle_two(ax, ay, bx, by):
    cx, cy = (ax + bx) / 2.0, (ay + by) / 2.0
    r2 = (ax - cx) ** 2 + (ay - cy) ** 2
    return cx, cy, r2


def _circle_three(ax, ay, bx, by, cx_, cy_):
    d = 2.0 * (ax * (by - cy_) + bx * (cy_ - ay) + cx_ * (ay - by))
    if d == 0.0:
        return None
    ux = ((ax * ax + ay * ay) * (by - cy_)
          + (bx * bx + by * by) * (cy_ - ay)
          + (cx_ * cx_ + cy_ * cy_) * (ay - by)) / d
    uy = ((ax * ax + ay * ay) * (cx_ - bx)
          + (bx * bx + by * by) * (ax - cx_)
          + (cx_ * cx_ + cy_ * cy_) * (bx - ax)) / d
    r2 = (ax - ux) ** 2 + (ay - uy) ** 2
    return ux, uy, r2


def _in_circle(c, x, y, eps=1e-9):
    return (x - c[0]) ** 2 + (y - c[1]) ** 2 <= c[2] * (1 + eps) + eps


def welzl_mec(xs: np.ndarray, ys: np.ndarray):
    """Deterministic (fixed-order) Welzl via the iterative
    move-to-front formulation: O(n) expected on shuffled input, O(n^2)
    worst case — fine on the hull-sized candidate set."""
    pts = list(zip(xs.tolist(), ys.tolist()))
    if not pts:
        return 0.0, 0.0, 0.0
    c = (pts[0][0], pts[0][1], 0.0)
    for i, (px, py) in enumerate(pts):
        if _in_circle(c, px, py):
            continue
        c = (px, py, 0.0)
        for j in range(i):
            qx, qy = pts[j]
            if _in_circle(c, qx, qy):
                continue
            c = _circle_two(px, py, qx, qy)
            for k in range(j):
                rx, ry = pts[k]
                if _in_circle(c, rx, ry):
                    continue
                c3 = _circle_three(px, py, qx, qy, rx, ry)
                if c3 is not None:
                    c = c3
    return c


def q_enclosing_circle(sf_dir: str):
    """One row (cx, cy, r2, n_hull): the minimal enclosing circle of
    purchase-event points (planar degrees) — per-block partial hulls
    then deterministic Welzl on the hull-of-hulls."""
    from oluray.pipelines.queries import _with_points

    ev = _read(sf_dir, "events", ["event_id", "event_type"])
    pts = _with_points(ev, "event_id")

    def part_hull(t: pa.Table) -> pa.Table:
        mask = pa.compute.equal(t["event_type"], "purchase")
        t = t.filter(mask)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        if len(lon) == 0:
            return pa.table({"lon": pa.array([], pa.float64()),
                             "lat": pa.array([], pa.float64())})
        hx, hy = geo.convex_hull(lon, lat)
        return pa.table({"lon": pa.array(hx), "lat": pa.array(hy)})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        lon = df["lon"].to_numpy(np.float64)
        lat = df["lat"].to_numpy(np.float64)
        if len(lon) == 0:
            return pd.DataFrame([{"cx": 0.0, "cy": 0.0, "r2": 0.0,
                                  "n_hull": 0}])
        hx, hy = geo.convex_hull(lon, lat)
        cx, cy, r2 = welzl_mec(hx, hy)
        return pd.DataFrame([{"cx": float(cx), "cy": float(cy),
                              "r2": float(r2),
                              "n_hull": int(len(hx))}])

    return pts.map_batches(part_hull, batch_format="pyarrow") \
        .repartition(1).map_batches(final, batch_format="pandas",
                                    batch_size=None)


QUERIES = {
    "lz_complexity": q_lz_complexity,
    "enclosing_circle": q_enclosing_circle,
}

ORACLE = {}
