"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard — the training-data-pipeline dedup family, Ray-Data-first.

Shapes (per the Ray Data guide's dedup patterns):

- **exact**: content hash inside `map_batches` (vectorized md5), then
  hash-partitioned `groupby(hash).map_groups(keep min id)`. The hash
  column (not the text) is the shuffle key, so the exchange moves
  16-byte digests, not documents.
- **MinHash+LSH**: shingle -> 64 minhashes via affine permutations of
  one FNV base hash (vectorized) -> band rows (band_id, band_hash,
  doc_id) -> `groupby(band)` emits candidate pairs -> exact Jaccard
  verify. Only candidate pairs ever pay the verify cost.
- **SimHash**: weighted bit-vote over token hashes -> 64-bit
  signature; near-dups = signatures within Hamming distance d
  (verified per candidate bucket on the signature's band prefixes).
- **n-gram Jaccard**: the exact verifier, also exposed standalone.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from oluray.stages.text import token_hashes

_MERSENNE = np.uint64((1 << 61) - 1)


def md5_hex(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: hashlib.md5(t.encode("utf-8", "surrogatepass")).hexdigest())


class AddTextHash:
    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["text_hash"] = md5_hex(batch["text"])
        return batch


def exact_dedup(docs, id_col: str = "doc_id", concurrency: int = 4):
    """Keep the min-id row per identical text. Returns Dataset of
    (doc_id, text_hash) — one row per distinct text."""
    hashed = docs.map_batches(AddTextHash, batch_format="pandas", concurrency=(1, concurrency))

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        return g.iloc[:1][[id_col, "text_hash"]]

    return hashed.select_columns([id_col, "text_hash"]).groupby("text_hash").map_groups(
        keep_first, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Hashes of the k-char shingle set (uint64, deduped)."""
    if len(text) < k:
        data = text.encode("utf-8", "surrogatepass")
        h = np.uint64(14695981039346656037)
        for b in data:
            h = (h ^ np.uint64(b)) * np.uint64(1099511628211)
        return np.array([h], dtype=np.uint64)
    b = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    if len(b) < k:
        return np.array([np.uint64(b.sum())], dtype=np.uint64)
    # vectorized polynomial hash of every k-byte window
    with np.errstate(over="ignore"):
        acc = np.zeros(len(b) - k + 1, dtype=np.uint64)
        for i in range(k):
            acc = acc * np.uint64(257) + b[i : len(b) - k + 1 + i].astype(np.uint64)
    return np.unique(acc)


_A = None
_B = None


def _perm_coeffs(n_perm: int, seed: int = 13):
    global _A, _B
    if _A is None or len(_A) != n_perm:
        rng = np.random.default_rng(seed)
        _A = rng.integers(1, (1 << 61) - 1, n_perm, dtype=np.uint64)
        _B = rng.integers(0, (1 << 61) - 1, n_perm, dtype=np.uint64)
    return _A, _B


def minhash_signature(shingles: np.ndarray, n_perm: int = 64) -> np.ndarray:
    """n_perm minhashes via affine permutations mod a Mersenne prime."""
    a, b = _perm_coeffs(n_perm)
    s = shingles % _MERSENNE
    with np.errstate(over="ignore"):
        # (n_perm, n_shingles) affine transform; overflow-safe because
        # mod-2^64 wraparound is applied identically everywhere
        m = (a[:, None] * s[None, :] + b[:, None]) % _MERSENNE
    return m.min(axis=1)


class MinHashBands:
    """doc -> (band_id, band_hash, doc_id) rows for LSH bucketing."""

    def __init__(self, n_perm: int = 64, bands: int = 16, shingle_k: int = 5):
        assert n_perm % bands == 0
        self.n_perm, self.bands, self.k = n_perm, bands, shingle_k
        self.rows_per_band = n_perm // bands
        _perm_coeffs(n_perm)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # vectorized across the whole batch: one (n_perm, total_shingles)
        # affine transform + segmented min per doc, then arithmetic band
        # folding — the only per-doc Python is the shingle extraction
        if len(batch) == 0:
            return pd.DataFrame({"doc_id": [], "band_id": [], "band_hash": []})
        shingle_sets = [char_shingles(t, self.k) for t in batch["text"]]
        counts = np.array([len(s) for s in shingle_sets], dtype=np.int64)
        flat = (
            np.concatenate(shingle_sets) if shingle_sets else np.array([], np.uint64)
        )
        a, b = _perm_coeffs(self.n_perm)
        s = flat % _MERSENNE
        with np.errstate(over="ignore"):
            m = (a[:, None] * s[None, :] + b[:, None]) % _MERSENNE
        seg_first = np.concatenate(([0], np.cumsum(counts)[:-1]))
        sigs = np.minimum.reduceat(m, seg_first, axis=1)  # (n_perm, ndocs)
        ndocs = len(counts)
        # fold each band's rows into one 61-bit hash (vectorized)
        folded = np.zeros((self.bands, ndocs), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for r in range(self.rows_per_band):
                rows = sigs[np.arange(self.bands) * self.rows_per_band + r]
                folded = (folded * np.uint64(1099511628211) + rows) % _MERSENNE
        doc_ids = np.tile(batch["doc_id"].to_numpy(), self.bands)
        band_ids = np.repeat(np.arange(self.bands, dtype=np.int64), ndocs)
        return pd.DataFrame(
            {
                "doc_id": doc_ids,
                "band_id": band_ids,
                "band_hash": folded.reshape(-1).astype(np.int64),
            }
        )


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def minhash_lsh_pairs(docs, threshold: float = 0.6, n_perm: int = 64,
                      bands: int = 16, shingle_k: int = 5,
                      concurrency: int = 4):
    """Near-duplicate pairs (doc_a < doc_b, jaccard >= threshold).

    Stages: bands (actor pool) -> groupby(band) candidate pairs ->
    exact Jaccard verify (broadcast of candidate texts only via
    self-lookup inside map_groups is avoided — instead the verify
    re-shingles both texts, fetched per group via a pandas join on a
    broadcast {doc_id: text} map built from the candidate ids, kept
    small because LSH already pruned).
    """
    import ray

    band_rows = docs.map_batches(
        MinHashBands,
        fn_constructor_kwargs=dict(n_perm=n_perm, bands=bands, shingle_k=shingle_k),
        batch_format="pandas",
        concurrency=(1, concurrency),
    ).materialize()
    # materialize: band rows are consumed twice (bucket sizing + hot
    # filter) and are ~24 bytes x bands per doc — far smaller than the
    # text they derive from; pinning beats re-running the shingle pass
    # (object store spills if needed)

    # Almost every (band_id, band_hash) bucket is a singleton — a
    # map_groups over all of them pays per-group overhead for nothing.
    # Instead: (1) partial-aggregate bucket sizes (combiner shrinks
    # the shuffle), (2) keep only buckets with >=2 docs (tiny), (3)
    # semi-filter band rows to those buckets, (4) pair locally.
    def partial_counts(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["band_id", "band_hash"], as_index=False).size()
        return g.rename(columns={"size": "c"})

    # partial counts per block, final merge on the driver: the partials
    # are one row per (block, bucket) — tiny relative to the corpus.
    # (Ray's multi-key groupby.aggregate pays ~2ms/group at this
    # version — 80k LSH buckets made it the bottleneck, measured 145s
    # vs <1s for this driver-side merge at sf0.1.)
    partial_frames = [
        b
        for b in band_rows.map_batches(
            partial_counts, batch_format="pandas", batch_size=65536
        ).iter_batches(batch_format="pandas")
    ]
    if not partial_frames:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
    sizes = (
        pd.concat(partial_frames, ignore_index=True)
        .groupby(["band_id", "band_hash"], as_index=False)["c"]
        .sum()
    )
    hot = sizes[sizes["c"] > 1]
    if hot.empty:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
    # composite key for the broadcast semi-filter
    hot_keys = set((hot["band_id"].astype(np.int64) * (1 << 50) + hot["band_hash"]).tolist())
    import ray as _ray

    hot_ref = _ray.put(np.fromiter(hot_keys, dtype=np.int64))

    def in_hot(t: pa.Table) -> pa.Table:
        keys = (
            t["band_id"].to_numpy(zero_copy_only=False).astype(np.int64) * (1 << 50)
            + t["band_hash"].to_numpy(zero_copy_only=False)
        )
        mask = np.isin(keys, _ray.get(hot_ref))
        return t.filter(pa.array(mask))

    collided = band_rows.map_batches(in_hot, batch_format="pyarrow").to_pandas()
    out_a, out_b = [], []
    for _, g in collided.groupby(["band_id", "band_hash"]):
        ids = sorted(set(g["doc_id"]))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
    cand_df = pd.DataFrame({"doc_a": out_a, "doc_b": out_b}).drop_duplicates()
    if cand_df.empty:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
    need = sorted(set(cand_df["doc_a"]) | set(cand_df["doc_b"]))
    texts = {}
    for b in docs.map_batches(
        lambda t: t.filter(pa.compute.is_in(t["doc_id"], value_set=pa.array(need))),
        batch_format="pyarrow",
    ).iter_batches(batch_format="pandas"):
        texts.update(dict(zip(b["doc_id"], b["text"])))
    sh = {d: char_shingles(texts[d], shingle_k) for d in need}
    jac = [
        jaccard(sh[a], sh[b]) for a, b in zip(cand_df["doc_a"], cand_df["doc_b"])
    ]
    cand_df = cand_df.assign(jaccard=np.round(jac, 6))
    return cand_df[cand_df["jaccard"] >= threshold].reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHash:
    """64-bit simhash over token hashes (unit weights)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.empty(len(batch), dtype=np.int64)
        for i, text in enumerate(batch["text"].tolist()):
            th = token_hashes(text)
            bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            sig = np.uint64(0)
            for b in range(64):
                if votes[b] > 0:
                    sig |= np.uint64(1) << np.uint64(b)
            sigs[i] = np.int64(sig)
        return pd.DataFrame({"doc_id": batch["doc_id"], "simhash": sigs})


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (np.asarray(a, np.int64).view(np.uint64)) ^ (np.asarray(b, np.int64).view(np.uint64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


def simhash_pairs(docs, max_hamming: int = 3, concurrency: int = 4):
    """Near-dup pairs by simhash band bucketing + exact verify.

    Pigeonhole guarantee: with `max_hamming + 1` bands, any pair
    within Hamming distance `max_hamming` agrees on at least one full
    band, so bucketing on bands has recall 1 for the target radius.
    """
    n_bands = min(max_hamming + 1, 32)
    width = 64 // n_bands
    sigs = docs.map_batches(SimHash, batch_format="pandas", concurrency=(1, concurrency))

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["simhash"].to_numpy().view(np.uint64)
        mask = np.uint64((1 << width) - 1)
        rows = []
        for band in range(n_bands):
            w = 64 - width * band if band == n_bands - 1 else width
            m = np.uint64((1 << w) - 1) if band == n_bands - 1 else mask
            part = ((s >> np.uint64(width * band)) & m).astype(np.int64)
            rows.append(pd.DataFrame({
                "doc_id": batch["doc_id"], "simhash": batch["simhash"],
                "band_id": band, "band_val": part,
            }))
        return pd.concat(rows, ignore_index=True)

    exploded = sigs.map_batches(explode, batch_format="pandas")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        n = len(g)
        if n < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        ids = g["doc_id"].to_numpy()
        sh = g["simhash"].to_numpy()
        ai, bi = np.triu_indices(n, 1)
        hd = hamming64(sh[ai], sh[bi])
        keep = hd <= max_hamming
        return pd.DataFrame(
            {"doc_a": ids[ai[keep]], "doc_b": ids[bi[keep]], "hamming": hd[keep]}
        )

    out = exploded.groupby(["band_id", "band_val"]).map_groups(pairs, batch_format="pandas")
    df = out.to_pandas()
    if df.empty:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
    return df.drop_duplicates(["doc_a", "doc_b"]).reset_index(drop=True)
