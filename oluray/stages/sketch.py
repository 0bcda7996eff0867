"""Mergeable cardinality sketches (HyperLogLog).

At 100 TB an exact distinct count of a high-cardinality column is a
full key shuffle (`joins.distinct` + count); the standing estimate a
pipeline dashboard wants is a SKETCH: fixed-size state, one streaming
scan, trivially mergeable across blocks/nodes/windows. Classic HLL
(Flajolet et al. 2007) with the standard small-range (linear
counting) correction.

Scale shape — same invariant as `joins.build_bloom`: every block
computes its own register array (vectorized `np.maximum.at`), the
driver max-merges them as they stream past. Driver MEMORY is one
register array (2^p bytes, 4 KiB at p=12); driver TRAFFIC is one
array per block — block-count bound, never key-count bound. Register
arrays are also valid per-partition outputs (persist them next to a
window's manifest and merging two windows' counts is `np.maximum`).

Reference anchor: the reference's only counting is exact COUNT over
SPARQL results (`src/osm/OsmDataFetcher.cpp:214-260`); this is part
of the beyond-reference training-data family (corpus cardinality
dashboards) where a pytest bounds the estimate against the exact
count instead of a SQL hash oracle (approximate by design).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from oluray.stages.joins import _mix64

__all__ = ["hll_registers", "hll_estimate", "hll_count", "approx_heavy_hitters"]


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount for uint64 (numpy 1.x has no
    bitwise_count)."""
    with np.errstate(over="ignore"):
        x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
        x = (x & np.uint64(0x3333333333333333)) + (
            (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
        )
        x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def _nlz64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized count of leading zeros (float log2 rounds up
    within 1 ulp of powers of two — off by one exactly where HLL rank
    tails matter)."""
    y = x.copy()
    for s in (1, 2, 4, 8, 16, 32):
        y |= y >> np.uint64(s)
    return np.uint64(64) - _popcount64(y)


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1.0 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))


def hll_registers(
    ds: "ray.data.Dataset", col: str, p: int = 12,
) -> np.ndarray:
    """One streaming scan -> the max-merged HLL register array
    (uint8[2^p]) for an int64 key column."""
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    m = 1 << p

    def block_regs(df: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(m, dtype=np.uint8)
        if len(df):
            h = _mix64(
                df[col].to_numpy(dtype=np.int64, na_value=0).view(np.uint64)
            )
            idx = (h >> np.uint64(64 - p)).astype(np.int64)
            rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
            # rank = leading zeros of the remaining 64-p bits, + 1.
            # The OR above plants a stop bit so rank <= 64-p+1 and
            # the all-zero edge case can't occur.
            rank = (_nlz64(rest) + np.uint64(1)).astype(np.uint8)
            np.maximum.at(regs, idx, rank)
        return pd.DataFrame({"regs": [regs]})

    out = np.zeros(m, dtype=np.uint8)
    mapped = ds.select_columns([col]).map_batches(
        block_regs, batch_format="pandas"
    )
    for b in mapped.iter_batches(batch_format="pandas", batch_size=16):
        for v in b["regs"]:
            np.maximum(out, v, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    """Cardinality estimate from a register array, with the standard
    small-range linear-counting correction."""
    m = len(regs)
    est = _alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            return m * float(np.log(m / zeros))
    return float(est)


def hll_count(ds: "ray.data.Dataset", col: str, p: int = 12) -> int:
    """Approximate COUNT(DISTINCT col): one scan, ~1.04/sqrt(2^p)
    relative error (~1.6% at the default p=12)."""
    return int(round(hll_estimate(hll_registers(ds, col, p))))


def approx_heavy_hitters(
    ds: "ray.data.Dataset", col: str, k: int = 10, per_block: int = 256,
) -> pd.DataFrame:
    """Approximate top-k heaviest keys (the hot-key detector feeding
    `stages/skew.py`'s salting decision): every block keeps its exact
    local top-`per_block` counts, the driver sums the candidates.

    Guarantee (Misra-Gries flavored): any key whose global frequency
    exceeds 1/per_block of ANY block it appears in survives that
    block's cut, so true heavy hitters — the only keys that matter
    for salting — are candidates with near-certainty; reported counts
    are lower bounds (a key's count in blocks where it missed the cut
    is dropped). Driver state is <= per_block x blocks rows of
    (key, count) — block-count bound. For exact counts of the
    survivors, follow with one `joins.semi_join` + grouped count.

    Returns a pandas DataFrame (key, count_lb) of the top k by
    summed lower-bound count, key ascending on ties."""

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"key": pd.Series([], dtype="int64"),
                 "count_lb": pd.Series([], dtype="int64")}
            )
        vc = df[col].value_counts().head(per_block)
        return pd.DataFrame(
            {"key": vc.index.to_numpy(dtype=np.int64),
             "count_lb": vc.to_numpy(dtype=np.int64)}
        )

    cand = ds.select_columns([col]).map_batches(
        local_top, batch_format="pandas"
    ).to_pandas()
    if len(cand) == 0:
        return pd.DataFrame(
            {"key": pd.Series([], dtype="int64"),
             "count_lb": pd.Series([], dtype="int64")}
        )
    g = cand.groupby("key", as_index=False)["count_lb"].sum()
    g = g.sort_values(["count_lb", "key"], ascending=[False, True],
                      kind="mergesort").head(k)
    g["count_lb"] = g["count_lb"].astype("int64")
    return g.reset_index(drop=True)


def cms_build(
    ds: "ray.data.Dataset", col: str, width: int = 16384, depth: int = 4,
) -> np.ndarray:
    """Count-min sketch over an int64 key column: depth x width int64
    counters, each row keyed by an independent splitmix64-derived
    hash. Same merge discipline as the HLL/Bloom builds: per-block
    sketches (vectorized scatter-add), driver SUMS them streaming past
    — CMS merge is exact addition, so sketch(A ∪ B) == sketch(A) +
    sketch(B) bit-for-bit (tested). Estimates are upper bounds:
    est(k) >= true(k) always, overshooting by ~total/width per row
    with failure probability 2^-depth (take the min across rows)."""
    if width <= 0 or depth <= 0 or depth > 16:
        raise ValueError(f"bad CMS shape ({depth} x {width})")

    def block_cms(df: pd.DataFrame) -> pd.DataFrame:
        cms = np.zeros((depth, width), dtype=np.int64)
        if len(df):
            k = df[col].to_numpy(dtype=np.int64, na_value=0).view(np.uint64)
            for d in range(depth):
                h = _mix64(k ^ np.uint64((0xA076_1D64_78BD_642F * (d + 1)) & 0xFFFF_FFFF_FFFF_FFFF))
                np.add.at(cms[d], (h % np.uint64(width)).astype(np.int64), 1)
        return pd.DataFrame({"cms": [cms]})

    out = np.zeros((depth, width), dtype=np.int64)
    mapped = ds.select_columns([col]).map_batches(
        block_cms, batch_format="pandas"
    )
    for b in mapped.iter_batches(batch_format="pandas", batch_size=16):
        for v in b["cms"]:
            np.add(out, v, out=out)
    return out


def cms_query(cms: np.ndarray, keys) -> np.ndarray:
    """Point-frequency upper-bound estimates for `keys` (vectorized
    min across the depth rows)."""
    depth, width = cms.shape
    k = np.asarray(keys, dtype=np.int64).view(np.uint64)
    est = np.full(len(k), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        h = _mix64(k ^ np.uint64((0xA076_1D64_78BD_642F * (d + 1)) & 0xFFFF_FFFF_FFFF_FFFF))
        est = np.minimum(est, cms[d][(h % np.uint64(width)).astype(np.int64)])
    return est


def hll_count_by_group(
    ds: "ray.data.Dataset",
    group_cols: "list[str] | tuple[str, ...]",
    col: str,
    p: int = 12,
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """Per-group approximate COUNT(DISTINCT col): the grouped form of
    `hll_count`. Each block emits ONE register blob (2^p bytes) per
    distinct group it contains — the shuffle moves sketches, never
    keys — then a hash-partitioned max-merge + estimate per group.
    Mergeable and idempotent (register max), so re-partitioning or
    block-order changes can't alter the result.

    Output: group_cols + `approx_distinct` (int64). Relative error
    ~1.04/sqrt(2^p) (~1.6% at p=12). For exact needs use the
    distinct + grouped-count composition instead."""
    from oluray.stages import joins

    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    m = 1 << p
    gcols = list(group_cols)

    def block_regs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({c: df[c] for c in gcols} | {"regs": []})
        codes, uniques = pd.factorize(
            pd.MultiIndex.from_frame(df[gcols]) if len(gcols) > 1
            else df[gcols[0]]
        )
        h = _mix64(df[col].to_numpy(dtype=np.int64, na_value=0).view(np.uint64))
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
        rank = (_nlz64(rest) + np.uint64(1)).astype(np.uint8)
        regs = np.zeros((len(uniques), m), dtype=np.uint8)
        np.maximum.at(regs.reshape(-1), codes * m + idx, rank)
        out = pd.DataFrame(
            list(uniques) if len(gcols) > 1 else {gcols[0]: uniques}
        )
        if len(gcols) > 1:
            out.columns = gcols
        out["regs"] = [r.tobytes() for r in regs]
        return out

    sketches = ds.select_columns(gcols + [col]).map_batches(
        block_regs, batch_format="pandas", batch_size=65536
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({c: df[c] for c in gcols}
                                | {"approx_distinct": pd.array([], dtype="int64")})

        def est(blobs: pd.Series) -> int:
            regs = np.frombuffer(blobs.iloc[0], np.uint8).copy()
            for b in blobs.iloc[1:]:
                np.maximum(regs, np.frombuffer(b, np.uint8), out=regs)
            return int(round(hll_estimate(regs)))

        g = df.groupby(gcols, as_index=False, sort=False).agg(
            approx_distinct=("regs", est))
        g["approx_distinct"] = g["approx_distinct"].astype("int64")
        return g

    return joins.partitioned_map(sketches, gcols, merge,
                                 num_partitions=num_partitions,
                                 pre_repartition=False)


# ---------------------------------------------------------------------------
# mergeable quantile sketch (deterministic Munro-Paterson compaction)
# ---------------------------------------------------------------------------


def _mp_block_sketch(vals: np.ndarray, k: int):
    """Sketch of one block: sort once, chop into size-k sorted
    buffers at level 0 (the remainder stays a weight-1 partial),
    then compact pairs upward. Returns (buffers, partial) where
    buffers is a list of (level, sorted np.ndarray of len k)."""
    vals = np.sort(vals.astype(np.float64, copy=False), kind="stable")
    nfull = len(vals) // k
    buffers = [(0, vals[i * k:(i + 1) * k]) for i in range(nfull)]
    partial = vals[nfull * k:]
    return _mp_compact(buffers, k), partial


def _mp_compact(buffers, k: int):
    """Pairwise collapse until <= 1 buffer per level: merge two
    sorted level-L buffers (2k values) and keep alternating elements
    (offset flips per compaction — deterministic, no RNG) as one
    level-L+1 buffer. Classic Munro-Paterson; a value in a level-L
    buffer stands for 2^L input values."""
    from collections import defaultdict

    by_level = defaultdict(list)
    for lv, buf in buffers:
        by_level[lv].append(buf)
    parity = 0
    lv = 0
    while lv <= max(by_level, default=0):
        bl = by_level[lv]
        # deterministic order regardless of arrival: by head value
        bl.sort(key=lambda b: (b[0], b[-1]))
        while len(bl) >= 2:
            a, b = bl.pop(0), bl.pop(0)
            m = np.sort(np.concatenate([a, b]), kind="stable")
            by_level[lv + 1].append(m[parity::2])
            parity ^= 1
        lv += 1
    return [(lv, b) for lv in sorted(by_level) for b in by_level[lv]]


def mp_quantile_sketch(
    ds: "ray.data.Dataset", col: str, k: int = 256,
):
    """Build a mergeable quantile sketch of `ds[col]` — the
    approx-quantile primitive (Spark's approxQuantile lineage;
    Munro & Paterson 1980, Manku et al. 1998). Deterministic: no
    sampling RNG, compaction parity alternates by counter, and the
    driver folds per-block sketches in a content-sorted order, so
    the result is a pure function of the data + block layout.

    Scale shape (the `hll_registers` invariant): every block reduces
    itself to <= k*levels + k values via ONE vectorized sort; only
    those survivors travel. Driver memory is one sketch
    (O(k log(n/k)) values); traffic is block-count bound. Buffers are
    plain (level, values) rows — persist them per partition and
    merging two windows' sketches is list-concat + `_mp_compact`."""
    import pyarrow as pa

    def block(t: "pa.Table") -> "pa.Table":
        v = t[col].to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        buffers, partial = _mp_block_sketch(v, k)
        levels = [lv for lv, _ in buffers] + [-1] * (len(partial) > 0)
        arrs = [b for _, b in buffers] + ([partial] if len(partial) else [])
        return pa.table({
            "level": pa.array(levels, pa.int32()),
            "vals": pa.array([a.tolist() for a in arrs],
                             pa.list_(pa.float64())),
        })

    rows = ds.map_batches(block, batch_format="pyarrow",
                          batch_size=64 * 1024)
    buffers, partials = [], []
    for batch in rows.iter_batches(batch_format="pyarrow"):
        lv = batch["level"].to_pylist()
        vs = batch["vals"].to_pylist()
        for L, v in zip(lv, vs):
            a = np.asarray(v, dtype=np.float64)
            (partials if L < 0 else buffers).append(
                a if L < 0 else (L, a))
    # fold the weight-1 tails in as level-0 buffers + one final partial
    tail = np.sort(np.concatenate(partials)) if partials else np.empty(0)
    nfull = len(tail) // k
    for i in range(nfull):
        buffers.append((0, tail[i * k:(i + 1) * k]))
    partial = tail[nfull * k:]
    buffers.sort(key=lambda t: (t[0], t[1][0] if len(t[1]) else np.inf,
                                t[1][-1] if len(t[1]) else np.inf))
    return _mp_compact(buffers, k), partial


def mp_quantile_query(sketch, qs) -> np.ndarray:
    """Approximate quantiles from a sketch: expand to (value, weight
    = 2^level) pairs (partial values weigh 1), one weighted nearest-
    rank pick per q. Rank error is O(log(n/k) * n / k) — bounded in
    the pytest against exact quantiles on uniform and zipf data."""
    buffers, partial = sketch
    vals = [b for _, b in buffers] + ([partial] if len(partial) else [])
    wts = [np.full(len(b), 1 << lv, dtype=np.int64) for lv, b in buffers]
    if len(partial):
        wts.append(np.ones(len(partial), dtype=np.int64))
    if not vals:
        raise ValueError("empty sketch — no values were added")
    v = np.concatenate(vals)
    w = np.concatenate(wts)
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cw = np.cumsum(w)
    total = cw[-1]
    out = np.empty(len(qs), dtype=np.float64)
    for i, q in enumerate(qs):
        target = q * (total - 1) + 1  # 1-based nearest rank
        out[i] = v[np.searchsorted(cw, target, side="left")]
    return out


def join_size_estimate(
    a: "ray.data.Dataset", a_col: str,
    b: "ray.data.Dataset", b_col: str,
    width: int = 16384, depth: int = 4,
) -> dict:
    """Equi-join cardinality estimate WITHOUT running the join: the
    inner product of the two sides' count-min sketches. E[est] =
    |A ⋈ B| + (|A|·|B| - true)/width per row; taking the MIN across
    the `depth` independent rows gives an upper-bound estimate with
    failure probability ~2^-depth (the classic CM join-size result,
    Cormode & Muthukrishnan 2005 — the cheap planner input for the
    auto_join broadcast-vs-shuffle decision when neither side is
    materialized). Two streaming scans, driver state = 2 sketches.

    Returns {"estimate": int, "per_row": [int per depth]} — estimate
    is the min-row inner product, always >= the true join size in
    expectation, never an undercount by more than CMS noise."""
    ca = cms_build(a, a_col, width=width, depth=depth)
    cb = cms_build(b, b_col, width=width, depth=depth)
    # accumulate in float64: a key appearing ~3e9+ times on BOTH sides
    # (plausible at planner scale) overflows an int64 per-cell product
    # and numpy wraps silently — the "upper bound" would come back
    # negative or tiny (ADVICE r3)
    per_row = (ca.astype(np.float64) * cb.astype(np.float64)).sum(axis=1)
    return {"estimate": int(per_row.min()),
            "per_row": [int(x) for x in per_row]}


# ---------------------------------------------------------------------------
# DGIM sliding-window counting (Datar-Gionis-Indyk-Motwani)
# ---------------------------------------------------------------------------

DGIM_R = 4  # max buckets per size => relative error <= 1/(2*(R-1))


def dgim_update(buckets: list[tuple[int, int]], ts: int,
                r: int = DGIM_R) -> list[tuple[int, int]]:
    """Fold one hit at timestamp `ts` into a DGIM bucket list
    ((newest_ts, size), newest first; sizes are powers of two and
    non-decreasing toward the tail). Whenever more than `r` buckets
    share a size, the two OLDEST of that size merge into one of
    double size — the cascade walks sizes upward, so state is
    O(r log n) per key and no event is ever stored individually."""
    buckets = [(ts, 1)] + buckets
    size = 1
    while True:
        idxs = [k for k, (_, s) in enumerate(buckets) if s == size]
        if len(idxs) <= r:
            break
        ia, ib = idxs[-1], idxs[-2]  # the two oldest of this size
        merged = (max(buckets[ia][0], buckets[ib][0]), size * 2)
        buckets = [b for k, b in enumerate(buckets) if k not in (ia, ib)]
        pos = 0
        while pos < len(buckets) and buckets[pos][0] > merged[0]:
            pos += 1
        buckets.insert(pos, merged)
        size *= 2
    return buckets


def dgim_query(buckets: list[tuple[int, int]], cutoff_ts: int) -> int:
    """Estimate hits with ts >= cutoff: all buckets whose newest ts is
    inside the window count fully except the OLDEST such bucket,
    which counts half (rounded up) — the canonical DGIM estimator,
    relative error <= 1/(2*(R-1)) for R buckets per size."""
    inside = [s for t, s in buckets if t >= cutoff_ts]
    if not inside:
        return 0
    return sum(inside[:-1]) + (inside[-1] + 1) // 2


# ---------------------------------------------------------------------------
# KMV (k minimum values / bottom-k) distinct sketch
# ---------------------------------------------------------------------------

def kmv_minima(ds: "ray.data.Dataset", col: str, k: int = 256) -> np.ndarray:
    """One streaming scan -> the sorted k smallest distinct 64-bit
    hash values of an int64 key column (the bottom-k / KMV sketch,
    Bar-Yossef et al.). Mergeable exactly like HLL registers — the
    union sketch is the k smallest of the concatenated minima — and
    unlike HLL it supports DIRECT intersection estimation via the
    resemblance of two signatures (min-wise property), which is what
    `kmv_intersect_estimate` uses. Per-block combiner keeps each
    block's bottom-k only, so driver traffic is k * block count."""
    if k < 1:
        raise ValueError("k must be >= 1")

    def block_mins(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"h": pd.Series([], dtype="uint64")})
        h = _mix64(
            df[col].to_numpy(dtype=np.int64, na_value=0).view(np.uint64))
        h = np.unique(h)  # sorted distinct
        return pd.DataFrame({"h": h[:k]})

    mapped = ds.select_columns([col]).map_batches(
        block_mins, batch_format="pandas")
    acc = np.array([], dtype=np.uint64)
    for b in mapped.iter_batches(batch_format="pandas", batch_size=4096):
        acc = np.unique(np.concatenate([acc, b["h"].to_numpy()]))[:k]
    return acc


def kmv_estimate(minima: np.ndarray, k: int = 256) -> float:
    """Distinct-count estimate: if fewer than k distinct hashes were
    ever seen the sketch IS the exact distinct set; else the k-th
    minimum's normalized rank gives (k-1) / h_(k) (unbiased)."""
    if len(minima) < k:
        return float(len(minima))
    hk = float(minima[k - 1]) / float(2**64)
    if hk <= 0.0:
        return float(k)
    return (k - 1) / hk


def kmv_intersect_estimate(
    ma: np.ndarray, mb: np.ndarray, k: int = 256,
) -> float:
    """|A ∩ B| estimate from two KMV signatures: take the union
    sketch's bottom-k, measure the fraction of those that appear in
    BOTH signatures (the min-wise resemblance rho), and scale the
    union estimate — rho * |A ∪ B|. Direct (no inclusion-exclusion
    cancellation), the KMV advantage over HLL intersection."""
    u = np.unique(np.concatenate([ma, mb]))[:k]
    if len(u) == 0:
        return 0.0
    both = np.intersect1d(ma, mb, assume_unique=True)
    rho = np.isin(u, both, assume_unique=True).sum() / len(u)
    return float(rho) * kmv_estimate(u, k)
