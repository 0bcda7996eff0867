"""Wave-10 catalog: SCD type-2 history build, raster slope/gradient,
zlib compressibility quality signal.

`scd2_history` is the warehouse change-history classic (type-1 =
`latest_wins` keeps only the current row; type-2 keeps every state
with a validity interval). `slope_aspect` extends the focal raster
family from smoothing (mean/median/mode) to the FIRST-DERIVATIVE
stencil — the hillshade/terrain primitive. `compress_ratio` is the
LLM-corpus quality heuristic that repetitive machine-generated text
compresses far better than natural prose. Registered by
``oluray.pipelines.queries``.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from oluray.functions import geo
from oluray.stages import joins, spatial


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# scd2_history — slowly-changing-dimension type-2 intervals
# ---------------------------------------------------------------------------


def q_scd2_history(sf_dir: str):
    """SCD type-2 history: collapse each user's event-type stream into
    validity intervals — one row per STATE CHANGE carrying
    [valid_from, valid_to) (valid_to = -1 for the open current state).
    The type-2 complement of `latest_wins` (type-1 overwrite): the
    full history stays queryable, which is what an incremental
    100 TB snapshot store needs for time-travel reads. Plan: one
    user-hash partition pass, inside it the vectorized
    sort + shift != compare (no per-key loop), emitting only change
    rows — output is bounded by the number of state transitions, not
    events."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts",
                                  "event_type"])

    def scd2(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "event_type": pd.Series([], dtype="object"),
            "valid_from_us": pd.Series([], dtype="int64"),
            "valid_to_us": pd.Series([], dtype="int64")})
        if len(df) == 0:
            return empty
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort").reset_index(drop=True)
        uid = df["user_id"].to_numpy(np.int64)
        typ = df["event_type"].to_numpy()
        tus = (df["ts"].astype("datetime64[us]").astype("int64")
               .to_numpy())
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        changed = np.concatenate(([True], typ[1:] != typ[:-1])) | new_user
        cu, ct, cf = uid[changed], typ[changed], tus[changed]
        cnew = new_user[changed]
        # valid_to = next change's valid_from within the same user
        nxt = np.concatenate((cf[1:], [np.int64(-1)]))
        nxt_new = np.concatenate((cnew[1:], [True]))
        vto = np.where(nxt_new, np.int64(-1), nxt)
        return pd.DataFrame({
            "user_id": cu, "event_type": ct,
            "valid_from_us": cf, "valid_to_us": vto})

    return joins.partitioned_map(ev, ["user_id"], scd2, num_partitions=16)


_SCD2_SQL = """
WITH s AS (
  SELECT user_id, event_id, ts, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events),
ch AS (
  SELECT user_id, event_id, ts, event_type FROM s
  WHERE prev IS NULL OR prev <> event_type)
SELECT user_id, event_type,
       epoch_us(ts)::BIGINT AS valid_from_us,
       coalesce(lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id),
                -1)::BIGINT AS valid_to_us
FROM ch
"""


# ---------------------------------------------------------------------------
# slope_aspect — central-difference gradient over the event grid
# ---------------------------------------------------------------------------

SLOPE_RES = 6  # 64 x 64 grid


def q_slope_aspect(sf_dir: str):
    """Raster gradient (terrain slope/aspect primitive) over the event
    density grid: per occupied cell, the integer central differences
    dzdx = n(East) - n(West), dzdy = n(North) - n(South) with
    unoccupied neighbors counting 0, x wrapping at the antimeridian,
    y clamped at the poles; grad2 = dzdx^2 + dzdy^2 (the squared
    gradient magnitude — integer, so no rounded float crosses the
    oracle). Scale shape mirrors the focal family: counts collapse
    through a combiner shuffle first, then each occupied cell ships
    FOUR signed (target, contrib) rows — work is bounded by distinct
    occupied cells, never event rows."""
    ev = _read(sf_dir, "events", ["event_id"])
    base = spatial.add_cell_column(
        _with_points(ev, "event_id"), SLOPE_RES).select_columns(["cell"])
    n = 1 << SLOPE_RES

    def partial(t: pa.Table) -> pa.Table:
        cells, counts = np.unique(
            t["cell"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"cell": pa.array(cells),
                         "n": pa.array(counts.astype(np.int64))})

    def ssum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("cell", as_index=False)["n"].sum()

    counts = joins.grouped_agg(
        base.map_batches(partial, batch_format="pyarrow"),
        ["cell"], ssum, num_partitions=16,
        pre_repartition=False).materialize()

    base_id = SLOPE_RES * geo.RES_SHIFT

    def contribs(t: pa.Table) -> pa.Table:
        cell = t["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        rel = cell - base_id
        y, x = rel // geo.Y_SHIFT, rel % geo.Y_SHIFT
        outs = []
        # a cell with count n is the EAST neighbor of (x-1, y): +n to
        # that cell's dzdx; the WEST neighbor of (x+1, y): -n; the
        # NORTH neighbor of (x, y-1): +n to dzdy; SOUTH of (x, y+1): -n
        for dx, dy, sx, sy in ((-1, 0, 1, 0), (1, 0, -1, 0),
                               (0, -1, 0, 1), (0, 1, 0, -1)):
            tx = (x + dx) % n
            ty = y + dy
            ok = (ty >= 0) & (ty < n)
            outs.append(pd.DataFrame({
                "cell": base_id + ty[ok] * geo.Y_SHIFT + tx[ok],
                "cx": (cnt[ok] * sx).astype(np.int64),
                "cy": (cnt[ok] * sy).astype(np.int64)}))
        out = pd.concat(outs, ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    def gsum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("cell", as_index=False)[["cx", "cy"]].sum()

    grads = joins.grouped_agg(
        counts.map_batches(contribs, batch_format="pyarrow"),
        ["cell"], gsum, num_partitions=16)

    _G = pa.schema([("cell", pa.int64()), ("cx", pa.int64()),
                    ("cy", pa.int64())])
    _C = pa.schema([("cell", pa.int64()), ("n", pa.int64())])
    # LEFT join: an occupied cell with NO occupied neighbors still
    # appears in the raster (gradient 0), matching the oracle
    j = joins.hash_join(counts, grads, on="cell", num_partitions=16,
                        how="left", left_schema=_C, right_schema=_G)

    def finish(t: pa.Table) -> pa.Table:
        cxp = t["cx"].to_pandas().fillna(0)
        cyp = t["cy"].to_pandas().fillna(0)
        cx = cxp.to_numpy(np.int64)
        cy = cyp.to_numpy(np.int64)
        return pa.table({
            "cell": t["cell"], "n": t["n"],
            "dzdx": pa.array(cx), "dzdy": pa.array(cy),
            "grad2": pa.array(cx * cx + cy * cy)})

    return j.map_batches(finish, batch_format="pyarrow")


def _with_points(ds: ray.data.Dataset, key: str) -> ray.data.Dataset:
    def pts(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        lon, lat = geo.derive_lonlat(k)
        return pa.table({key: pa.array(k), "lon": pa.array(lon),
                         "lat": pa.array(lat)})

    return ds.map_batches(pts, batch_format="pyarrow")


def _slope_sql() -> str:
    lon, lat = geo.derive_lonlat_sql("event_id")
    n = 1 << SLOPE_RES
    x = (f"LEAST(GREATEST(floor((({lon} + 180.0) / 360.0) * {float(n)!r})"
         f"::BIGINT, 0), {n - 1})")
    y = (f"LEAST(GREATEST(floor((({lat} + 90.0) / 180.0) * {float(n)!r})"
         f"::BIGINT, 0), {n - 1})")
    return f"""
WITH c AS (
  SELECT x, y, ({SLOPE_RES} * {geo.RES_SHIFT} + y * {geo.Y_SHIFT} + x)
           AS cell,
         count(*)::BIGINT AS n
  FROM (SELECT {x} AS x, {y} AS y FROM events) GROUP BY x, y)
SELECT a.cell, a.n,
       (coalesce(e.n, 0) - coalesce(w.n, 0))::BIGINT AS dzdx,
       (coalesce(nn.n, 0) - coalesce(s.n, 0))::BIGINT AS dzdy,
       ((coalesce(e.n, 0) - coalesce(w.n, 0))
        * (coalesce(e.n, 0) - coalesce(w.n, 0))
        + (coalesce(nn.n, 0) - coalesce(s.n, 0))
        * (coalesce(nn.n, 0) - coalesce(s.n, 0)))::BIGINT AS grad2
FROM c a
LEFT JOIN c e ON e.x = (a.x + 1) % {n} AND e.y = a.y
LEFT JOIN c w ON w.x = (a.x - 1 + {n}) % {n} AND w.y = a.y
LEFT JOIN c nn ON nn.x = a.x AND nn.y = a.y + 1
LEFT JOIN c s ON s.x = a.x AND s.y = a.y - 1
"""


# ---------------------------------------------------------------------------
# compress_ratio — zlib compressibility quality signal (rows-only)
# ---------------------------------------------------------------------------


def q_compress_ratio(sf_dir: str):
    """zlib compressibility per document — the corpus-quality
    heuristic that boilerplate / repetitive machine text compresses
    far below natural prose (used as a cheap filter before expensive
    dedup). Inherently a per-document codec call (like image decode);
    the batch loop is the codec boundary, everything around it is
    columnar. ratio_e6 = compressed*1e6 // raw is integer so the
    pytest can recompute it bit-for-bit."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def comp(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        raw = np.fromiter((len(t.encode("utf-8")) for t in df["text"]),
                          dtype=np.int64, count=len(df))
        cz = np.fromiter(
            (len(zlib.compress(t.encode("utf-8"), 6)) for t in df["text"]),
            dtype=np.int64, count=len(df))
        nz = np.maximum(raw, 1)
        return pd.DataFrame({
            "doc_id": ids, "n_raw": raw, "n_zlib": cz,
            "ratio_e6": cz * 1_000_000 // nz})

    return docs.map_batches(comp, batch_format="pandas", batch_size=512)


QUERIES = {
    "scd2_history": q_scd2_history,
    "slope_aspect": q_slope_aspect,
    "compress_ratio": q_compress_ratio,
}

ORACLE = {
    "scd2_history": _SCD2_SQL,
    "slope_aspect": _slope_sql(),
}
