"""Wave-8 catalog: windowed stream-stream join, nonzero-winding PIP,
Johnson-Lindenstrauss projection, HLL set-intersection estimation.

The stream-stream join is the two-sided sibling of the as-of family
(both inputs unbounded, matches confined to a +/- window — the
watermarked join of streaming SQL); nonzero winding completes the PIP
semantics pair (even-odd `pip_join` vs nonzero `pip_winding`, which
differ exactly on self-intersecting polygons — OSM multipolygon
repair territory); JL projection and HLL intersection extend the
embedding / sketch families. Registered by
``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from oluray.functions import geo
from oluray.stages import joins, sketch


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


def _ts_us(col: pd.Series) -> np.ndarray:
    return col.astype("datetime64[us]").astype("int64").to_numpy()


# ---------------------------------------------------------------------------
# stream_join — time-windowed stream-stream equi join
# ---------------------------------------------------------------------------

SJ_WINDOW_US = 3_600_000_000  # +/- 1 hour


def q_stream_join(sf_dir: str):
    """Windowed stream-stream join: every (click, purchase) pair of
    the same user within +/- 1 hour — the two-unbounded-inputs join
    of streaming SQL (Flink's interval join), where neither side can
    be a broadcast build table and the as-of family's
    last-match-only shortcut (`attribution`) doesn't apply: ALL
    in-window pairs are emitted. Plan: both streams bucket by
    (user, ts // W); the PURCHASE side alone replicates to buckets
    b-1, b, b+1 (one-sided ghosts — each pair forms exactly once, in
    the click's home bucket, because a purchase's three copies land
    in three distinct buckets), one hash-partitioned merge per
    (user, bucket), then the exact |dt| <= W filter. State per
    partition is bucket-local — the watermark semantics that lets a
    real stream discard buckets older than the window."""
    import pyarrow.compute as pc

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts",
                                  "event_type"])
    clicks = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "click")),
        batch_format="pyarrow")
    purchases = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "purchase")),
        batch_format="pyarrow")

    # both sides padded to ONE schema before the union (the repo's
    # unified-schema union contract — mismatched block schemas can't
    # be concatenated downstream)
    def _pad(key, bucket, eid, tu, okey, ou) -> pa.Table:
        n = len(key)

        def col(v):
            if v is None:
                return pa.nulls(n, pa.int64())
            return pa.array(v, type=pa.int64())

        return pa.table({"key": col(key), "bucket": col(bucket),
                         "eid": col(eid), "tu": col(tu),
                         "okey": col(okey), "ou": col(ou)})

    def ev_rows(t: pa.Table) -> pa.Table:
        tu = _ts_us(t["ts"].to_pandas())
        key = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return _pad(key, tu // SJ_WINDOW_US, eid, tu, None, None)

    def ord_rows(t: pa.Table) -> pa.Table:
        tu = _ts_us(t["ts"].to_pandas())
        key = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = tu // SJ_WINDOW_US
        return _pad(np.tile(key, 3), np.concatenate([b - 1, b, b + 1]),
                    None, None, np.tile(pid, 3), np.tile(tu, 3))

    e = clicks.map_batches(ev_rows, batch_format="pyarrow")
    o = purchases.map_batches(ord_rows, batch_format="pyarrow")

    # one co-partitioned merge per (key, bucket)
    def local_join(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"click_id": pd.Series([], dtype="int64"),
                              "purchase_id": pd.Series([], dtype="int64"),
                              "dt_s": pd.Series([], dtype="int64")})
        if len(df) == 0:
            return empty
        evs = df[df["eid"].notna()]
        ords = df[df["okey"].notna()]
        if len(evs) == 0 or len(ords) == 0:
            return empty
        m = evs[["key", "bucket", "eid", "tu"]].merge(
            ords[["key", "bucket", "okey", "ou"]], on=["key", "bucket"])
        if len(m) == 0:
            return empty
        dt = m["tu"].to_numpy(np.int64) - m["ou"].to_numpy(np.int64)
        m = m[np.abs(dt) <= SJ_WINDOW_US]
        return pd.DataFrame({
            "click_id": m["eid"].to_numpy(np.int64),
            "purchase_id": m["okey"].to_numpy(np.int64),
            "dt_s": (m["tu"].to_numpy(np.int64)
                     - m["ou"].to_numpy(np.int64)) // 1_000_000})

    both = e.union(o)
    return joins.partitioned_map(both, ["key", "bucket"], local_join,
                                 num_partitions=16)


def _stream_join_sql() -> str:
    return f"""
SELECT c.event_id AS click_id, p.event_id AS purchase_id,
       (CASE WHEN epoch_us(c.ts) >= epoch_us(p.ts)
             THEN (epoch_us(c.ts) - epoch_us(p.ts)) // 1000000
             ELSE -(((epoch_us(p.ts) - epoch_us(c.ts)) + 999999) // 1000000)
        END)::BIGINT AS dt_s
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND abs(epoch_us(c.ts) - epoch_us(p.ts)) <= {SJ_WINDOW_US}
"""


# ---------------------------------------------------------------------------
# pip_winding — nonzero-rule point-in-polygon (self-intersecting ring)
# ---------------------------------------------------------------------------

# pentagram: the classic even-odd vs nonzero discriminator — its
# central pentagon has winding number 2 (inside by nonzero, OUTSIDE by
# even-odd)
_STAR_CX, _STAR_CY = 10.0, 5.0
_STAR_R = 60.0
PENTAGRAM_LON = [
    _STAR_CX + _STAR_R * v for v in
    (0.0, -0.5877852522924731, 0.9510565162951535,
     -0.9510565162951536, 0.5877852522924729)]
PENTAGRAM_LAT = [
    _STAR_CY + _STAR_R * v for v in
    (1.0, -0.8090169943749475, 0.30901699437494745,
     0.30901699437494723, -0.8090169943749476)]


def q_pip_winding(sf_dir: str):
    """NONZERO-winding-rule PIP over a self-intersecting pentagram —
    the semantics pair-completer for `pip_join` (even-odd): the two
    rules agree on simple rings and differ exactly where OSM data gets
    messy (self-intersecting multipolygon rings; nonzero is what
    keeps the pentagram's center filled). Emits each customer's
    integer winding number and both rules' verdicts so the disagreeing
    region is visible in the output. Vectorized directed-crossing
    counts, float ops mirrored op-for-op in the SQL oracle (the
    cell_encode float-exactness contract)."""
    cust = _read(sf_dir, "customer", ["c_custkey"])
    rx, ry = PENTAGRAM_LON, PENTAGRAM_LAT
    nv = len(rx)

    def wn(t: pa.Table) -> pa.Table:
        cid = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        px, py = geo.derive_lonlat(cid)
        w = np.zeros(len(px), dtype=np.int64)
        cross = np.zeros(len(px), dtype=np.int64)
        for i in range(nv):
            ax, ay = rx[i], ry[i]
            bx, by = rx[(i + 1) % nv], ry[(i + 1) % nv]
            left = ((bx - ax) * (py - ay) - (by - ay) * (px - ax))
            up = (ay <= py) & (py < by) & (left > 0.0)
            down = (by <= py) & (py < ay) & (left < 0.0)
            w = w + up.astype(np.int64) - down.astype(np.int64)
            # even-odd = odd total of directed crossings either way
            cross = cross + up.astype(np.int64) + down.astype(np.int64)
        inside_nz = w != 0
        inside_eo = (cross % 2) == 1
        keep = inside_nz | inside_eo
        return pa.table({
            "c_custkey": pa.array(cid[keep]),
            "wn": pa.array(w[keep]),
            "in_nonzero": pa.array(inside_nz[keep].astype(np.int64)),
            "in_evenodd": pa.array(inside_eo[keep].astype(np.int64))})

    return cust.map_batches(wn, batch_format="pyarrow")


def _pip_winding_sql() -> str:
    lon, lat = geo.derive_lonlat_sql("c_custkey")
    rx, ry = PENTAGRAM_LON, PENTAGRAM_LAT
    nv = len(rx)
    up_terms, down_terms = [], []
    for i in range(nv):
        ax, ay = rx[i], ry[i]
        bx, by = rx[(i + 1) % nv], ry[(i + 1) % nv]
        left = (f"(({bx!r} - {ax!r}) * (py - {ay!r})"
                f" - ({by!r} - {ay!r}) * (px - {ax!r}))")
        up_terms.append(
            f"(CASE WHEN {ay!r} <= py AND py < {by!r} AND {left} > 0.0"
            f" THEN 1 ELSE 0 END)")
        down_terms.append(
            f"(CASE WHEN {by!r} <= py AND py < {ay!r} AND {left} < 0.0"
            f" THEN 1 ELSE 0 END)")
    up = " + ".join(up_terms)
    down = " + ".join(down_terms)
    return f"""
WITH p AS (SELECT c_custkey, {lon} AS px, {lat} AS py FROM customer),
w AS (SELECT c_custkey,
             ({up}) - ({down}) AS wn,
             ({up}) + ({down}) AS crossings
      FROM p)
SELECT c_custkey, wn::BIGINT AS wn,
       (CASE WHEN wn <> 0 THEN 1 ELSE 0 END)::BIGINT AS in_nonzero,
       (CASE WHEN crossings % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS in_evenodd
FROM w
WHERE wn <> 0 OR crossings % 2 = 1
"""


# ---------------------------------------------------------------------------
# jl_project — seeded Johnson-Lindenstrauss sign projection (rows-only)
# ---------------------------------------------------------------------------

JL_K = 16


def _jl_signs(d: int, k: int) -> np.ndarray:
    """Deterministic +/-1 matrix (d, k) from a splitmix-style integer
    hash of (i, j) — reproducible on any worker with no RNG state to
    ship (the projection matrix is CODE, not data)."""
    i = np.arange(d, dtype=np.uint64)[:, None]
    j = np.arange(k, dtype=np.uint64)[None, :]
    z = i * np.uint64(0x9E3779B97F4A7C15) + j * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    return np.where((z & np.uint64(1)).astype(bool), 1.0, -1.0)


def q_jl_project(sf_dir: str):
    """Johnson-Lindenstrauss dimensionality reduction of the embedding
    table: project dim-d vectors to k=16 with a DETERMINISTIC +/-1
    sign matrix derived from an integer hash (Achlioptas'
    database-friendly JL) scaled by 1/sqrt(k) — pairwise distances
    preserved within (1 +/- eps) whp, no trained state, no RNG to
    synchronize across workers. One zero-state map_batches; the
    rows-only pytest audits the distortion bound on sampled pairs.
    Complements the TRAINED reducers (pca_project, pq codebooks) with
    the oblivious one."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def project(t: pa.Table) -> pa.Table:
        vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        E = np.vstack([np.asarray(v, dtype=np.float64)
                       for v in t["embedding"].to_pylist()])
        S = _jl_signs(E.shape[1], JL_K)
        P = (E @ S) / np.sqrt(float(JL_K))
        return pa.table({"vec_id": pa.array(vid),
                         "proj": pa.array(list(P.astype(np.float32)))})

    return emb.map_batches(project, batch_format="pyarrow", batch_size=1024)


# ---------------------------------------------------------------------------
# hll_intersect — sketch-based set-intersection estimate (rows-only)
# ---------------------------------------------------------------------------

HLL_P = 12


def q_hll_intersect(sf_dir: str):
    """Set-algebra over mergeable sketches: estimate |clickers ∩
    purchasers| by inclusion-exclusion over three HLL register arrays
    (|A| + |B| - |A∪B|, where the union sketch is the register-wise
    MAX of the two — the merge that makes HLL composable across
    windows and segments). Three streaming scans, driver memory =
    three 4 KiB arrays. Error grows with the Jaccard gap (documented
    sketch-paper caveat): the pytest bounds it against exact distinct
    counts at this scale."""
    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def only(etype: str):
        def f(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return t.filter(pc.equal(t["event_type"], etype))
        return f

    clicks = ev.map_batches(only("click"), batch_format="pyarrow")
    buys = ev.map_batches(only("purchase"), batch_format="pyarrow")
    ra = sketch.hll_registers(clicks, "user_id", HLL_P)
    rb = sketch.hll_registers(buys, "user_id", HLL_P)
    a = sketch.hll_estimate(ra)
    b = sketch.hll_estimate(rb)
    u = sketch.hll_estimate(np.maximum(ra, rb))
    inter = max(0, int(round(a + b - u)))
    return pd.DataFrame({"n_clickers": [int(round(a))],
                         "n_purchasers": [int(round(b))],
                         "n_union": [int(round(u))],
                         "n_intersect_est": [inter]}).astype("int64")


QUERIES = {
    "stream_join": q_stream_join,
    "pip_winding": q_pip_winding,
    "jl_project": q_jl_project,
    "hll_intersect": q_hll_intersect,
}

ORACLE = {
    "stream_join": _stream_join_sql(),
    "pip_winding": _pip_winding_sql(),
}
