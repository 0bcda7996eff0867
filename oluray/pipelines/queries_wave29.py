"""Wave-29 catalog: rich-club connectivity sweep and per-image
bright-blob counting.

`rich_club` is the network-core statistic (do hubs form a club?):
for each threshold k, the count of nodes with degree > k and of
edges whose BOTH endpoints pass — phi(k) = 2*E_k/(N_k*(N_k-1)) is
the caller's. Histogram form: node counts are suffix sums of the
degree histogram, edge counts suffix sums of the per-edge
min-endpoint-degree histogram — so after the degree join the sweep
costs one aggregate-sized pass, not one scan per k.

`image_blob_count` is per-image object counting: 4-connected
components of the bright mask (2*gray*n_px > 3*px_sum, i.e.
gray > 1.5x the image mean — an exact integer comparison), via
two-pass union-find labeling inside the decode actor. Rows-only
(pixel decode is not SQL); brute flood-fill verification in pytest.
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from oluray.stages import joins

RC_KS = (1, 2, 3, 5, 8)


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# rich_club — (k, n_nodes, n_edges) over the interaction graph
# ---------------------------------------------------------------------------


def q_rich_club(sf_dir: str):
    """One row per k in RC_KS: nodes with deg > k, edges with
    min(deg_lo, deg_hi) > k. Degrees and the min-degree edge column
    come from two aggregate-sized hash joins; the k-sweep folds the
    two histograms."""
    from oluray.pipelines.queries import _interaction_edges

    e = _interaction_edges(sf_dir)

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        lo = np.minimum(df["a"].to_numpy(), df["b"].to_numpy())
        hi = np.maximum(df["a"].to_numpy(), df["b"].to_numpy())
        return pd.DataFrame({"lo": lo, "hi": hi}).drop_duplicates()

    ce = joins.distinct(
        e.map_batches(canon, batch_format="pandas"), ["lo", "hi"],
        num_partitions=8).materialize()

    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": np.concatenate(
            [df["lo"].to_numpy(np.int64), df["hi"].to_numpy(np.int64)])})

    def dcount(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False).size().rename(
            columns={"size": "deg"})
        g["deg"] = g["deg"].astype("int64")
        return g

    deg = joins.grouped_agg(
        ce.map_batches(endpoints, batch_format="pandas"),
        ["node"], dcount, num_partitions=8,
        pre_repartition=False).materialize()

    j1 = joins.hash_join(
        ce, deg.map_batches(
            lambda d: d.rename(columns={"node": "lo", "deg": "deg_lo"}),
            batch_format="pandas"),
        "lo", num_partitions=8)
    j2 = joins.hash_join(
        j1, deg.map_batches(
            lambda d: d.rename(columns={"node": "hi", "deg": "deg_hi"}),
            batch_format="pandas"),
        "hi", num_partitions=8)

    def edge_hist(df: pd.DataFrame) -> pd.DataFrame:
        me = np.minimum(df["deg_lo"].to_numpy(np.int64),
                        df["deg_hi"].to_numpy(np.int64))
        u, c = np.unique(me, return_counts=True)
        return pd.DataFrame({"mindeg": u,
                             "n": c.astype("int64")})

    def node_hist(df: pd.DataFrame) -> pd.DataFrame:
        u, c = np.unique(df["deg"].to_numpy(np.int64),
                         return_counts=True)
        return pd.DataFrame({"deg": u, "n": c.astype("int64")})

    eh = j2.map_batches(edge_hist, batch_format="pandas").to_pandas() \
        .groupby("mindeg", as_index=False)["n"].sum()
    nh = deg.map_batches(node_hist, batch_format="pandas").to_pandas() \
        .groupby("deg", as_index=False)["n"].sum()
    rows = []
    for k in RC_KS:
        rows.append((k,
                     int(nh.loc[nh["deg"] > k, "n"].sum()),
                     int(eh.loc[eh["mindeg"] > k, "n"].sum())))
    return pd.DataFrame(rows, columns=["k", "n_nodes", "n_edges"])


def _rich_club_sql() -> str:
    from oluray.pipelines.queries_wave22 import _EDGES_CTE

    ks = ", ".join(f"({k})" for k in RC_KS)
    return f"""
    WITH {_EDGES_CTE},
    canon AS (SELECT DISTINCT LEAST(a, b) AS lo, GREATEST(a, b) AS hi
              FROM edges),
    deg AS (SELECT node, count(*)::BIGINT AS deg FROM (
              SELECT lo AS node FROM canon
              UNION ALL SELECT hi FROM canon) GROUP BY node),
    em AS (SELECT LEAST(dl.deg, dh.deg) AS mindeg
           FROM canon JOIN deg dl ON dl.node = canon.lo
                      JOIN deg dh ON dh.node = canon.hi),
    ks(k) AS (VALUES {ks})
    SELECT k::BIGINT AS k,
           (SELECT count(*) FROM deg WHERE deg > k)::BIGINT AS n_nodes,
           (SELECT count(*) FROM em WHERE mindeg > k)::BIGINT
             AS n_edges
    FROM ks
    """


# ---------------------------------------------------------------------------
# image_blob_count — 4-connected bright components per image
# ---------------------------------------------------------------------------


def label_components(mask: np.ndarray) -> int:
    """Count 4-connected True components: two-pass union-find over
    the row-major grid, vectorized merges per row pair."""
    h, w = mask.shape
    idx = np.full((h, w), -1, dtype=np.int64)
    idx[mask] = np.arange(int(mask.sum()))
    parent = np.arange(int(mask.sum()), dtype=np.int64)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    ys, xs = np.nonzero(mask)
    for y, x in zip(ys.tolist(), xs.tolist()):
        a = idx[y, x]
        if x + 1 < w and mask[y, x + 1]:
            ra, rb = find(a), find(idx[y, x + 1])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        if y + 1 < h and mask[y + 1, x]:
            ra, rb = find(a), find(idx[y + 1, x])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    roots = {find(int(i)) for i in range(len(parent))}
    return len(roots)


class BlobCount:
    """Actor-pool stage: decode once, exact bright mask
    (2*gray*n > 3*sum), count 4-connected components."""

    def __init__(self):
        from oluray.functions import imagecodec

        self.decode = imagecodec.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("image_id", "n_blobs", "n_bright")}
        for iid, blob, fmt in zip(batch["image_id"].to_pylist(),
                                  batch["bytes"].to_pylist(),
                                  batch["fmt"].to_pylist()):
            gray = self.decode(blob, fmt).astype(np.int64).sum(axis=2)
            s, n = int(gray.sum()), gray.size
            mask = 2 * gray * n > 3 * s
            out["image_id"].append(iid)
            out["n_blobs"].append(label_components(mask))
            out["n_bright"].append(int(mask.sum()))
        return pa.table({
            "image_id": pa.array(out["image_id"]),
            "n_blobs": pa.array(out["n_blobs"], pa.int64()),
            "n_bright": pa.array(out["n_bright"], pa.int64())})


def q_image_blob_count(sf_dir: str):
    """Per-image bright-object count. Decode-local; rows-only;
    brute flood-fill verification in pytest."""
    from oluray.pipelines.queries import _synth_images

    images = _synth_images(sf_dir)
    return images.map_batches(BlobCount, batch_format="pyarrow",
                              batch_size=256, concurrency=(1, 4))


QUERIES = {
    "rich_club": q_rich_club,
    "image_blob_count": q_image_blob_count,
}

ORACLE = {
    "rich_club": _rich_club_sql(),
}
