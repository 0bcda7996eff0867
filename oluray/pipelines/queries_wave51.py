"""Wave-51 catalog: kNN label purity.

`knn_purity` is the embedding-quality audit (is the space
label-coherent?): for a deterministic query subset (vec_id % 7 ==
0), find each query's nearest OTHER vector by cosine (vec_id
tiebreak) and tally per label how many neighbors share the query's
label. Composes the `ann.brute_topk` machinery with k = 2 (rank 1
is the query itself unless an identical vector with a smaller id
outranks it — either way the best non-self row is in the top 2);
labels join back on the aggregate-sized neighbor table. The oracle
ranks non-self pairs directly with `list_cosine_similarity`, the
`ann_topk` contract.
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from oluray.stages import ann, joins

PURITY_MOD = 7


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


def _purity_queries(sf_dir: str):
    """Deterministic small query side (the `_ann_queries` pattern:
    queries ride as a broadcast matrix, the corpus never moves)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids_all = t["vec_id"].to_numpy().astype(np.int64)
    t = t.filter(pa.array(ids_all % PURITY_MOD == 0))
    ids = t["vec_id"].to_numpy().astype(np.int64)
    qm = np.stack(t["embedding"].to_numpy(zero_copy_only=False))
    return ids, qm.astype(np.float64)


def q_knn_purity(sf_dir: str):
    """(label, n_queries, n_pure): per query label, how many
    nearest non-self neighbors share it."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    lab = _read(sf_dir, "embeddings", ["vec_id", "label"])
    qids, qm = _purity_queries(sf_dir)
    nn = ann.brute_topk(emb, qids, qm, k=2, round_digits=6)

    def best_nonself(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["vec_id"] != df["query_id"]]
        df = df.sort_values(["query_id", "rank"])
        out = df.groupby("query_id", as_index=False).first()
        return pd.DataFrame({
            "query_id": out["query_id"].astype("int64"),
            "vec_id": out["vec_id"].astype("int64")})

    # top-2 rows per query are tiny (2 * |queries|); one regroup
    best = joins.grouped_agg(nn, ["query_id"], best_nonself,
                             num_partitions=4)
    lab64 = lab.map_batches(
        lambda d: pd.DataFrame({"vec_id": d["vec_id"].astype("int64"),
                                "label": d["label"].astype("int64")}),
        batch_format="pandas")
    j1 = joins.hash_join(
        best, lab64.map_batches(
            lambda d: d.rename(columns={"vec_id": "query_id",
                                        "label": "q_label"}),
            batch_format="pandas"),
        "query_id", num_partitions=4)
    j2 = joins.hash_join(
        j1, lab64.map_batches(
            lambda d: d.rename(columns={"label": "n_label"}),
            batch_format="pandas"),
        "vec_id", num_partitions=4)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "label": df["q_label"].astype("int64"),
            "n_queries": np.ones(len(df), dtype=np.int64),
            "n_pure": (df["q_label"].to_numpy(np.int64)
                       == df["n_label"].to_numpy(np.int64))
            .astype("int64")})
        return g.groupby("label", as_index=False).sum()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("label", as_index=False)[
            ["n_queries", "n_pure"]].sum()
        for c in ("label", "n_queries", "n_pure"):
            g[c] = g[c].astype("int64")
        return g

    return joins.grouped_agg(
        j2.map_batches(fold, batch_format="pandas"),
        ["label"], final, num_partitions=4, pre_repartition=False)


_PURITY_SQL = f"""
    WITH nn AS (
      SELECT q.vec_id AS query_id, q.label AS q_label,
             e.label AS n_label,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(
                 q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                        e.vec_id ASC) AS rnk
      FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
      WHERE q.vec_id % {PURITY_MOD} = 0)
    SELECT q_label::BIGINT AS label, count(*)::BIGINT AS n_queries,
           SUM(CASE WHEN q_label = n_label THEN 1 ELSE 0 END)::BIGINT
             AS n_pure
    FROM nn WHERE rnk = 1 GROUP BY q_label
"""


QUERIES = {
    "knn_purity": q_knn_purity,
}

ORACLE = {
    "knn_purity": _PURITY_SQL,
}
