"""Wave-52 catalog: per-label coverage radius.

`label_radius` is the cluster-compactness audit that pairs with
`knn_purity`: per embedding label, the 90th-percentile squared
distance of members to their label centroid — computed EXACTLY by
clearing denominators: with per-dim quantized coords
xq = round(x*1e3) and per-label sums (n, s_d), the scaled squared
distance D2 = sum_d (n*xq_d - s_d)^2 is an integer (the true
squared distance times (n*1e3)^2), and the q90 order statistic of
integers is hash-exact. Per-label moments fold once
(label-count x 64 rows); the second pass scores members against
the broadcast sums with Python-int accumulation (n*xq products
clear int64 near 1e5-member labels — the `q_group_linreg`
discipline); the quantile uses the floor(q*(n-1)) convention. The
oracle explodes dims with a range join and replays the identical
integers in HUGEINT.
Registered by ``oluray.pipelines.queries``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from oluray.stages import joins

DIM = 64
RQ = 0.9  # the reported order statistic


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from oluray.sources.io import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


def q_label_radius(sf_dir: str):
    """(label, n, d2_q90): scaled squared coverage radius per label
    (divide by (n*1e3)^2 for the metric value)."""
    from oluray.pipelines.queries import _round_half_away

    emb = _read(sf_dir, "embeddings", ["vec_id", "label", "embedding"])

    def moments(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        M = np.stack(t["embedding"].to_numpy(zero_copy_only=False))
        q = _round_half_away(M.astype(np.float64) * 1e3)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        codes, uniq = pd.factorize(lab)
        s = np.zeros((len(uniq), DIM), dtype=np.int64)
        np.add.at(s, codes, q)
        cnt = np.bincount(codes, minlength=len(uniq))
        lbl = np.repeat(uniq, DIM)
        dim = np.tile(np.arange(DIM, dtype=np.int64), len(uniq))
        return pa.table({"label": pa.array(lbl),
                         "dim": pa.array(dim),
                         "s": pa.array(s.ravel()),
                         "n": pa.array(np.repeat(cnt, DIM)
                                       .astype(np.int64))})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["label", "dim"], as_index=False)[
            ["s", "n"]].sum()
        for c in ("label", "dim", "s", "n"):
            g[c] = g[c].astype("int64")
        return g

    cent = joins.grouped_agg(
        emb.map_batches(moments, batch_format="pyarrow"),
        ["label"], fold, num_partitions=4,
        pre_repartition=False).to_pandas()
    # label-count x 64 rows — a tiny broadcast constant
    sums, ns = {}, {}
    for lbl, sub in cent.groupby("label"):
        sub = sub.sort_values("dim")
        sums[int(lbl)] = sub["s"].to_numpy(np.int64).astype(object)
        ns[int(lbl)] = int(sub["n"].iloc[0])

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "d2": pa.array([], pa.float64())})
        M = np.stack(t["embedding"].to_numpy(zero_copy_only=False))
        q = _round_half_away(M.astype(np.float64) * 1e3) \
            .astype(object)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        d2 = np.empty(len(lab), dtype=object)
        for lbl in np.unique(lab):
            m = lab == lbl
            diff = ns[int(lbl)] * q[m] - sums[int(lbl)][None, :]
            d2[m] = (diff * diff).sum(axis=1)
        return pa.Table.from_pandas(
            pd.DataFrame({"label": lab,
                          "d2": [str(v) for v in d2]}),
            preserve_index=False)

    scored = emb.map_batches(score, batch_format="pyarrow")

    def quant(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lbl, sub in df.groupby("label", sort=False):
            vals = sorted(int(v) for v in sub["d2"])
            n = len(vals)
            idx = int(np.floor(RQ * (n - 1)))
            # stringified: D2 exceeds int64 once labels grow past
            # ~1e5 members (n^2 * 1e6 * dim); the SQL twin emits the
            # HUGEINT as VARCHAR too
            rows.append((int(lbl), n, str(vals[idx])))
        out = pd.DataFrame(rows, columns=["label", "n", "d2_q90"])
        out["label"] = out["label"].astype("int64")
        out["n"] = out["n"].astype("int64")
        out["d2_q90"] = out["d2_q90"].astype("string")
        return out

    return joins.grouped_agg(scored, ["label"], quant,
                             num_partitions=4)


_RADIUS_SQL = f"""
    WITH x AS (
      SELECT vec_id, label, d.i AS dim,
             round(list_extract(embedding, d.i) * 1000.0, 0)::BIGINT
               AS xq
      FROM embeddings, range(1, {DIM + 1}) d(i)),
    c AS (SELECT label, dim, SUM(xq)::HUGEINT AS s,
                 count(*)::HUGEINT AS n
          FROM x GROUP BY label, dim),
    d2 AS (
      SELECT x.vec_id, x.label,
             SUM((c.n * x.xq - c.s) * (c.n * x.xq - c.s))::HUGEINT
               AS d2
      FROM x JOIN c ON c.label = x.label AND c.dim = x.dim
      GROUP BY x.vec_id, x.label),
    l AS (SELECT label, list(d2 ORDER BY d2) AS xs,
                 count(*)::BIGINT AS n
          FROM d2 GROUP BY label)
    SELECT label::BIGINT AS label, n,
           CAST(list_extract(
             xs, CAST(floor({RQ!r} * (n - 1)) AS BIGINT) + 1)
             AS VARCHAR) AS d2_q90
    FROM l
"""


QUERIES = {
    "label_radius": q_label_radius,
}

ORACLE = {
    "label_radius": _RADIUS_SQL,
}
