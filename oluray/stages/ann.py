"""Similarity search over an embedding column (`list<float>`).

- `brute_topk` — the exact baseline: broadcast query matrix
  (`ray.put` once), per-batch numpy matmul against zero-copy Arrow
  batches, per-batch local top-k, then one tiny
  `groupby(query_id)` final reduce. The shuffle moves only
  (batch-count x Q x k) candidate rows, never embeddings.
- `lsh_topk` — the scale path: random-hyperplane LSH buckets
  (seeded, deterministic); queries probe their own bucket plus
  multi-probe neighbors (single-bit flips); recall measured against
  brute force in tests.
- embedding-cosine near-duplicate pairs via the same bucketing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch[col].combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BruteTopK:
    """Per-batch exact cosine top-k against the broadcast queries."""

    def __init__(self, queries_ref, k: int):
        qids, qm = ray.get(queries_ref)
        self.qids = np.asarray(qids, dtype=np.int64)
        self.qn = _normalize(np.asarray(qm, dtype=np.float64))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_matrix(batch))
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


def brute_topk(
    embeddings, query_ids, query_matrix, k: int = 5, concurrency: int = 4,
    round_digits: int = 6,
):
    """Exact top-k by cosine: per-batch candidates -> tiny global
    reduce per query. Returns Dataset (query_id, vec_id, rank, sim)."""
    qref = ray.put((np.asarray(query_ids, np.int64), np.asarray(query_matrix)))
    cand = embeddings.map_batches(
        BruteTopK,
        fn_constructor_kwargs=dict(queries_ref=qref, k=k),
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True], kind="mergesort")
        g = g.head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["sim"] = np.round(g["sim"], round_digits)
        return g[["query_id", "vec_id", "rank", "sim"]]

    return cand.groupby("query_id").map_groups(final, batch_format="pandas")


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
        m = _normalize(_matrix(batch))
        return batch.append_column("bucket", pa.array(lsh_bucket(m, self.planes)))


def lsh_topk(
    embeddings, query_ids, query_matrix, k: int = 5, n_bits: int = 8,
    n_probe_bits: int = 2, seed: int = 101, concurrency: int = 4,
):
    """Approximate top-k: bucket the corpus by hyperplane signs; each
    query scans only its bucket + all single/multi-bit-flip neighbor
    buckets up to `n_probe_bits`. Recall < 1 by design; tested vs
    brute force. Scale path: `bucket` doubles as the shuffle/partition
    key, so at cluster scale each bucket is one block neighborhood."""
    qm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    dim = qm.shape[1]
    planes = hyperplanes(dim, n_bits, seed)
    pref = ray.put(planes)
    bucketed = embeddings.map_batches(
        LshBucketStage, fn_constructor_kwargs=dict(planes_ref=pref),
        batch_format="pyarrow", concurrency=(1, concurrency),
    )
    qb = lsh_bucket(qm, planes)
    # probe set per query: flip up to n_probe_bits bits
    probes: dict[int, list[int]] = {}
    from itertools import combinations

    for qi, b in enumerate(qb.tolist()):
        s = {b}
        for r in range(1, n_probe_bits + 1):
            for bits in combinations(range(n_bits), r):
                v = b
                for bit in bits:
                    v ^= 1 << bit
                s.add(v)
        probes[qi] = sorted(s)
    wanted = sorted({b for v in probes.values() for b in v})
    sub = bucketed.map_batches(
        lambda t: t.filter(pa.compute.is_in(t["bucket"], value_set=pa.array(wanted))),
        batch_format="pyarrow",
    )
    # candidate matrices are small now; collect and finish locally
    cand = sub.to_pandas()
    if cand.empty:
        return pd.DataFrame({"query_id": [], "vec_id": [], "rank": [], "sim": []})
    cm = _normalize(np.stack(cand["embedding"].map(np.asarray)).astype(np.float64))
    cb = cand["bucket"].to_numpy()
    cid = cand["vec_id"].to_numpy()
    rows = []
    qids = np.asarray(query_ids, np.int64)
    for qi in range(len(qm)):
        mask = np.isin(cb, probes[qi])
        if not mask.any():
            continue
        sims = cm[mask] @ qm[qi]
        ids = cid[mask]
        order = np.lexsort((ids, -sims))[:k]
        for r, j in enumerate(order):
            rows.append((int(qids[qi]), int(ids[j]), r + 1, round(float(sims[j]), 6)))
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "rank", "sim"])


def cosine_near_dup_pairs(embeddings, threshold: float = 0.95, n_bits: int = 8,
                          seed: int = 101, concurrency: int = 4):
    """Embedding-cosine near-duplicate pairs via LSH buckets + exact
    within-bucket verify (vec_a < vec_b, sim >= threshold)."""
    qm_planes = None
    first = embeddings.take_batch(1, batch_format="pyarrow")
    dim = len(first["embedding"][0])
    planes = hyperplanes(dim, n_bits, seed)
    pref = ray.put(planes)
    bucketed = embeddings.map_batches(
        LshBucketStage, fn_constructor_kwargs=dict(planes_ref=pref),
        batch_format="pyarrow", concurrency=(1, concurrency),
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "sim": []})
        g = g.sort_values("vec_id")
        m = _normalize(np.stack(g["embedding"].map(np.asarray)).astype(np.float64))
        ids = g["vec_id"].to_numpy()
        sims = m @ m.T
        ai, bi = np.triu_indices(len(g), 1)
        keep = sims[ai, bi] >= threshold
        return pd.DataFrame(
            {
                "vec_a": ids[ai[keep]],
                "vec_b": ids[bi[keep]],
                "sim": np.round(sims[ai, bi][keep], 6),
            }
        )

    out = bucketed.groupby("bucket").map_groups(pairs, batch_format="pandas")
    return out.to_pandas().drop_duplicates(["vec_a", "vec_b"]).reset_index(drop=True)
