"""Skew handling: pre-aggregation combiners + salted repartition.

The reference leaves skew unhandled (one dense diff region just runs
long — single process). At 100 TB a dense cell (a city) would melt a
naive `groupby(cell)`; this module provides:

- `preagg_cell_counts` — two-phase grouped count: a per-batch partial
  aggregate inside `map_batches` (one row per key per BLOCK) followed
  by a tiny `groupby().sum()` over the partials. The all-to-all
  exchange moves #distinct-keys-per-block rows, not #rows.
- `salted` — adds a deterministic salt column (`hash(id) % buckets`)
  so `groupby([key, salt])` / `repartition` splits a hot key across
  `buckets` reducers; callers merge the per-salt partials afterwards
  (cheap: `buckets` rows per hot key).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum


def preagg_cell_counts(ds: ray.data.Dataset, key: str = "cell") -> ray.data.Dataset:
    """Grouped count with a partial-aggregate combiner (skew-safe)."""

    def partial(batch: pa.Table) -> pa.Table:
        tbl = batch.group_by(key).aggregate([(key, "count")])
        # rename BY NAME: pyarrow's keys-vs-aggregates column order in
        # group_by().aggregate() output is version-dependent; a
        # positional rename would silently swap key and count
        return tbl.select([key, f"{key}_count"]).rename_columns(
            [key, "partial_n"]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby(key).aggregate(Sum("partial_n", alias_name="n"))
    return out


def salted(
    ds: ray.data.Dataset, id_col: str, buckets: int = 16, out_col: str = "salt"
) -> ray.data.Dataset:
    """Deterministic salt from a stable id column (NOT random — keeps
    reruns and resumes byte-identical)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if pa.types.is_integer(ids.type):
            h = ids.to_numpy(zero_copy_only=False).astype(np.int64)
            s = (h * 2654435761) % buckets
        else:
            # pandas' keyed siphash — NOT Python hash(), which is
            # PYTHONHASHSEED-randomized per process and would give the
            # same id different salts in different Ray workers
            # (r2 review; breaks the byte-identical rerun contract)
            s = (
                pd.util.hash_array(np.asarray(ids.to_pylist(), dtype=object))
                % np.uint64(buckets)
            ).astype(np.int64)
        return batch.append_column(out_col, pa.array(np.abs(s).astype(np.int64)))

    return ds.map_batches(fn, batch_format="pyarrow")


def salted_group_apply(
    ds: ray.data.Dataset, key: str, fn, buckets: int = 16, id_col: str | None = None,
    batch_format: str = "pandas",
) -> ray.data.Dataset:
    """`groupby(key).map_groups(fn)` with hot keys split over salted
    sub-groups. `fn` must be decomposable (e.g. per-row transforms,
    partial reductions later merged). Partitioning assumption: fn's
    output per sub-group is independent of the other sub-groups."""
    s = salted(ds, id_col or key, buckets)
    return s.groupby([key, "salt"]).map_groups(fn, batch_format=batch_format)


def auto_salted_group_apply(
    ds: ray.data.Dataset, key: str, fn, buckets: int = 16,
    id_col: str | None = None, top: int = 64, per_block: int = 4096,
    batch_format: str = "pandas",
) -> ray.data.Dataset:
    """`salted_group_apply` that salts ONLY detected hot keys: a
    heavy-hitter pass (`sketch.approx_heavy_hitters`) finds the top
    candidates, and every other key gets salt 0 — so the caller's
    post-merge cost is `buckets` partials per HOT key instead of per
    key. Uniform data degrades to a plain groupby (one sub-group per
    key), skewed data splits exactly the keys that would melt a
    reducer.

    Two passes over `ds` (detector + group apply): pass a read-stage
    or materialized Dataset so the re-scan is cheap. `key` must be
    integer-typed (the detector's contract)."""
    from oluray.stages.sketch import approx_heavy_hitters

    hh = approx_heavy_hitters(ds, key, k=top, per_block=per_block)
    hot = np.sort(hh["key"].to_numpy(dtype=np.int64))
    salted_ds = salted(ds, id_col or key, buckets)

    def zero_cold(batch: pa.Table, hot=hot) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch["salt"].to_numpy(zero_copy_only=False)
        s = np.where(np.isin(k, hot), s, 0)
        return batch.set_column(
            batch.schema.get_field_index("salt"), "salt", pa.array(s)
        )

    salted_ds = salted_ds.map_batches(zero_cold, batch_format="pyarrow")
    return salted_ds.groupby([key, "salt"]).map_groups(
        fn, batch_format=batch_format
    )
