"""Impact closure: which unchanged elements need geometry recompute.

Reimplements the reference's SPARQL reverse-reference queries (J1-J10,
`/root/reference/src/sparql/QueryWriter.cpp:63-255`, drivers
`src/osm/OsmChangeHandler.cpp:217-341`) as local Ray Data operators:

- **explode** of `nd_refs` / `members` list columns via
  `pyarrow.compute.list_flatten` + `list_parent_indices` (zero-copy);
- **semi/anti joins** against the changed-id sets with a SIZE-PROBED
  dispatch (`KeySet`, r3): a set at or below the broadcast limit is a
  key array in the object store (`ray.put` once, `pc.is_in` per batch
  — zero shuffles; the reference pays one SPARQL round-trip per
  <=1024 ids, `src/osm/OsmChangeHandler.cpp:37,41-53`); a set above
  the limit stays a materialized distinct Dataset and the filter runs
  as `oluray.stages.joins.semi_join` (hash-partitioned both sides —
  no broadcast assumption). A minutely replication window always
  takes the broadcast path; a 100 TB backfill window's changed-id set
  switches automatically instead of requiring the caller to rewrite
  the pipeline (VERDICT r2 item 2).
- **collect-sorted reconstruction** (J8/J9 GROUP_CONCAT + re-sort by
  pos, `src/osm/OsmDataFetcher.cpp:281-330`) as
  `groupby(id).map_groups(sort -> list)`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def explode_way_refs(ways: ray.data.Dataset) -> ray.data.Dataset:
    """ways(id, nd_refs) -> (way_id, node_id, pos) one row per member.

    M5 reference extractor (`src/osm/OsmChangeHandler.cpp:662-706`).
    """

    def fn(batch: pa.Table) -> pa.Table:
        refs = batch["nd_refs"].combine_chunks()
        if isinstance(refs, pa.ChunkedArray):
            refs = refs.combine_chunks()
        flat = pc.list_flatten(refs)
        parents = pc.list_parent_indices(refs)
        way_ids = pc.take(batch["id"], parents)
        # position within each list
        offs = refs.offsets.to_numpy(zero_copy_only=False)
        sizes = np.diff(offs)
        pos = np.concatenate([np.arange(s) for s in sizes]) if len(sizes) else np.array([], np.int64)
        return pa.table(
            {"way_id": way_ids, "node_id": flat, "pos": pa.array(pos, pa.int64())}
        )

    return ways.map_batches(fn, batch_format="pyarrow")


def explode_relation_members(relations: ray.data.Dataset) -> ray.data.Dataset:
    """relations(id, members) -> (rel_id, ref, type, role, pos)."""

    def fn(batch: pa.Table) -> pa.Table:
        mem = batch["members"].combine_chunks()
        flat = pc.list_flatten(mem)
        parents = pc.list_parent_indices(mem)
        rel_ids = pc.take(batch["id"], parents)
        offs = mem.offsets.to_numpy(zero_copy_only=False)
        sizes = np.diff(offs)
        pos = np.concatenate([np.arange(s) for s in sizes]) if len(sizes) else np.array([], np.int64)
        return pa.table(
            {
                "rel_id": rel_ids,
                "ref": flat.field("ref"),
                "type": flat.field("type"),
                "role": flat.field("role"),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    return relations.map_batches(fn, batch_format="pyarrow")


def broadcast_keys(keys) -> "ray.ObjectRef":
    """Put a small key set in the object store ONCE; every task reads
    the same copy (no per-batch reshipping)."""
    arr = np.asarray(list(keys) if not isinstance(keys, np.ndarray) else keys, dtype=np.int64)
    return ray.put(np.unique(arr))


# a broadcast id set costs ~8 B/key in the object store; 4M keys
# (~32 MB, far more than any replication window's changed-id set)
# is where the dispatch flips to a hash-partitioned semi join
DEFAULT_BROADCAST_KEY_LIMIT = 4_000_000


class KeySet:
    """A distributed set of int64 keys with a size-probed access path.

    Two states: **broadcast** (a sorted-unique driver numpy array,
    shipped once via `ray.put`) or **dataset** (a materialized
    distinct Dataset that never touches the driver). `distinct_keys`
    picks the state from the measured key count; `semi_join` /
    `anti_join` dispatch on it. `tolist()` / `to_array()` materialize
    to the driver — fine for broadcast-sized sets and tests, by
    definition oversized for dataset-backed ones (callers wanting the
    raw ids of a huge set should consume `.ds` as a Dataset)."""

    def __init__(self, arr: np.ndarray | None = None,
                 ds: ray.data.Dataset | None = None,
                 col: str = "key", count: int | None = None,
                 limit: int = DEFAULT_BROADCAST_KEY_LIMIT):
        assert (arr is None) != (ds is None)
        self.arr = arr
        self.ds = ds
        self.col = col
        self.count = int(count) if count is not None else (
            len(arr) if arr is not None else None
        )
        self.limit = limit
        self._ref = None

    @property
    def is_broadcast(self) -> bool:
        return self.arr is not None

    @classmethod
    def from_array(cls, keys, limit: int = DEFAULT_BROADCAST_KEY_LIMIT) -> "KeySet":
        arr = np.asarray(
            list(keys) if not isinstance(keys, np.ndarray) else keys,
            dtype=np.int64,
        )
        return cls(arr=np.unique(arr), limit=limit)

    def ref(self):
        if self._ref is None:
            self._ref = ray.put(self.arr)
        return self._ref

    def key_dataset(self) -> ray.data.Dataset:
        """The set as a single-column Dataset named `__key`."""
        if self.is_broadcast:
            return ray.data.from_arrow(
                pa.table({"__key": pa.array(self.arr, pa.int64())})
            )

        def ren(t: pa.Table) -> pa.Table:
            return t.select([self.col]).rename_columns(["__key"])

        return self.ds.map_batches(ren, batch_format="pyarrow")

    def to_array(self) -> np.ndarray:
        if self.is_broadcast:
            return self.arr
        return _pull_ids(self.ds, self.col)

    def tolist(self) -> list:
        return self.to_array().tolist()

    def union(self, other: "KeySet") -> "KeySet":
        limit = max(self.limit, other.limit)
        if self.is_broadcast and other.is_broadcast:
            merged = np.union1d(self.arr, other.arr)
            if len(merged) <= limit:
                return KeySet(arr=merged, limit=limit)
            # re-probe: two just-under-limit operands can merge to ~2x
            # the broadcast budget — demote to a dataset-backed set so
            # downstream filters take the shuffle path instead of
            # ray.put-ing an oversized driver array per filter
            ds = ray.data.from_arrow(
                pa.table({"__key": pa.array(merged, pa.int64())})
            )
            return KeySet(ds=ds, col="__key", count=len(merged), limit=limit)
        merged = self.key_dataset().union(other.key_dataset())
        return distinct_keys(merged, "__key", limit=limit)


def wrap_keys(keys, limit: int = DEFAULT_BROADCAST_KEY_LIMIT) -> KeySet:
    """Normalize an array-like / KeySet argument (back-compat: the
    J-functions accept plain numpy arrays, as the tests do)."""
    if isinstance(keys, KeySet):
        return keys
    return KeySet.from_array(keys, limit=limit)


def _pull_ids(ds: ray.data.Dataset, col: str) -> np.ndarray:
    vals = []
    for batch in ds.select_columns([col]).iter_batches(batch_format="pyarrow"):
        vals.append(batch[col].to_numpy(zero_copy_only=False))
    if not vals:
        return np.array([], dtype=np.int64)
    return np.unique(np.concatenate(vals)).astype(np.int64)


def distinct_keys(
    ds: ray.data.Dataset, col: str,
    limit: int = DEFAULT_BROADCAST_KEY_LIMIT,
) -> KeySet:
    """Distinct keys of a column as a size-probed `KeySet`.

    Cost-ordered: (1) a per-block distinct combiner (map only — no
    shuffle) is materialized and counted; at or below `limit` rows the
    survivors are pulled and `np.unique`d on the driver — the small
    (minutely-window) case pays ZERO shuffles, exactly like the r2
    broadcast path. (2) Only when the per-block-distinct stream
    exceeds the limit does a hash-partitioned `joins.distinct` run;
    if the true distinct count then fits the limit the set is
    broadcast after all, else it stays a Dataset."""
    from oluray.stages import joins

    def dd(df: pd.DataFrame, _c: str = col) -> pd.DataFrame:
        return df[[_c]].drop_duplicates(_c)

    combined = ds.select_columns([col]).map_batches(
        dd, batch_format="pandas", batch_size=65536
    ).materialize()
    if combined.count() <= limit:
        return KeySet(arr=_pull_ids(combined, col), limit=limit)
    d = joins.distinct(combined, [col], num_partitions=32).materialize()
    n = d.count()
    if n <= limit:
        return KeySet(arr=_pull_ids(d, col), limit=limit)
    return KeySet(ds=d, col=col, count=n, limit=limit)


def semi_join(
    ds: ray.data.Dataset, col: str, keys,
    schema: pa.Schema | None = None, num_partitions: int = 32,
) -> ray.data.Dataset:
    """Rows whose `col` is in the key set (J1/J2/J3 shape).

    `keys` may be a legacy ObjectRef (always broadcast), an array-like
    (broadcast), or a `KeySet` (size-probed: broadcast `pc.is_in` vs
    hash-partitioned `joins.semi_join`). `schema` is the static Arrow
    schema hint for the shuffle path (avoids a schema-probing
    execution of a lazy lineage); the broadcast path never needs it.
    """
    return _key_filter(ds, col, keys, anti=False, schema=schema,
                       num_partitions=num_partitions)


def anti_join(
    ds: ray.data.Dataset, col: str, keys,
    schema: pa.Schema | None = None, num_partitions: int = 32,
) -> ray.data.Dataset:
    """Rows whose `col` is NOT in the key set — the reference's
    'except those already in the change file' filters
    (`src/osm/OsmChangeHandler.cpp:224-226,240-243,257-260`)."""
    return _key_filter(ds, col, keys, anti=True, schema=schema,
                       num_partitions=num_partitions)


def _key_filter(ds, col, keys, anti, schema, num_partitions):
    from oluray.stages import joins

    if isinstance(keys, ray.ObjectRef):
        keys_ref = keys
    elif isinstance(keys, KeySet) and not keys.is_broadcast:
        out = joins.semi_join(
            ds, keys.key_dataset(), on=col, key_col="__key", anti=anti,
            num_partitions=num_partitions, left_schema=schema,
            keys_schema=pa.schema([("__key", pa.int64())]),
        )
        return out
    else:
        keys_ref = wrap_keys(keys).ref()

    def fn(batch: pa.Table) -> pa.Table:
        kv = ray.get(keys_ref)
        mask = pc.is_in(batch[col], value_set=pa.array(kv, pa.int64()))
        return batch.filter(pc.invert(mask) if anti else mask)

    return ds.map_batches(fn, batch_format="pyarrow")


def distinct_ids(ds: ray.data.Dataset, col: str) -> np.ndarray:
    """A3 distinct ids of a (small, already-filtered) result —
    materialized to the driver as the next stage's broadcast set.
    Size-UNPROBED legacy path (oracle queries over known-small sets);
    the update pipeline uses `distinct_keys` instead."""
    return _pull_ids(ds, col)


# static schemas of the exploded member/location rows (the shuffle
# path needs types without executing the lineage; these are fixed by
# the explode functions above)
EXPLODED_WAYS_SCHEMA = pa.schema(
    [("way_id", pa.int64()), ("node_id", pa.int64()), ("pos", pa.int64())]
)
EXPLODED_MEMBERS_SCHEMA = pa.schema(
    [("rel_id", pa.int64()), ("ref", pa.int64()), ("type", pa.string()),
     ("role", pa.string()), ("pos", pa.int64())]
)
LOCATIONS_SCHEMA = pa.schema(
    [("id", pa.int64()), ("lon", pa.float64()), ("lat", pa.float64())]
)


def ways_to_update_geometry(
    ways: ray.data.Dataset, modified_node_ids, ways_in_changefile,
    limit: int = DEFAULT_BROADCAST_KEY_LIMIT,
) -> KeySet:
    """J1: ids of ways referencing any modified node, minus ways
    already in the change file (`src/sparql/QueryWriter.cpp:169-184`,
    driver `src/osm/OsmChangeHandler.cpp:217-230`)."""
    hits = semi_join(explode_way_refs(ways), "node_id",
                     wrap_keys(modified_node_ids, limit),
                     schema=EXPLODED_WAYS_SCHEMA)
    hits = anti_join(hits, "way_id", wrap_keys(ways_in_changefile, limit),
                     schema=EXPLODED_WAYS_SCHEMA)
    return distinct_keys(hits, "way_id", limit=limit)


def relations_to_update_geometry(
    relations: ray.data.Dataset,
    modified_node_ids,
    touched_way_ids,
    relations_in_changefile,
    limit: int = DEFAULT_BROADCAST_KEY_LIMIT,
) -> KeySet:
    """J2+J3: relations referencing modified nodes or touched ways,
    minus relations already in the change file
    (`src/sparql/QueryWriter.cpp:187-220`, driver `:232-262`)."""
    mem = explode_relation_members(relations)
    node_hits = semi_join(
        mem.map_batches(
            lambda b: b.filter(pc.equal(b["type"], "node")), batch_format="pyarrow"
        ),
        "ref",
        wrap_keys(modified_node_ids, limit),
        schema=EXPLODED_MEMBERS_SCHEMA,
    )
    way_hits = semi_join(
        mem.map_batches(
            lambda b: b.filter(pc.equal(b["type"], "way")), batch_format="pyarrow"
        ),
        "ref",
        wrap_keys(touched_way_ids, limit),
        schema=EXPLODED_MEMBERS_SCHEMA,
    )
    hits = node_hits.union(way_hits)
    hits = anti_join(hits, "rel_id", wrap_keys(relations_in_changefile, limit),
                     schema=EXPLODED_MEMBERS_SCHEMA)
    return distinct_keys(hits, "rel_id", limit=limit)


def relations_referencing_relations(
    relations: ray.data.Dataset, rel_ids, exclude_rel_ids=None,
    limit: int = DEFAULT_BROADCAST_KEY_LIMIT,
) -> KeySet:
    """J4: ids of relations whose members include any relation in
    `rel_ids` (reverse rel-of-rel reference), minus `exclude_rel_ids`
    (`src/sparql/QueryWriter.cpp:223-240`). The reference implements
    this query but keeps BOTH call sites disabled because osm2rdf
    computes no geometry for rel-of-rel members
    (`src/osm/OsmChangeHandler.cpp:84-85,264-297`); this operator is
    therefore flag-gated default-OFF in `apply_update` to match the
    reference's *enabled* behavior while completing the §2 inventory.

    Same exploded semi-join shape as J2/J3: filter members to
    type=='relation', semi-join `ref` against the key set, anti-join
    the owning `rel_id` against the exclusions, distinct."""
    mem = explode_relation_members(relations)
    hits = semi_join(
        mem.map_batches(
            lambda b: b.filter(pc.equal(b["type"], "relation")),
            batch_format="pyarrow",
        ),
        "ref",
        wrap_keys(rel_ids, limit),
        schema=EXPLODED_MEMBERS_SCHEMA,
    )
    if exclude_rel_ids is not None:
        hits = anti_join(hits, "rel_id", wrap_keys(exclude_rel_ids, limit),
                         schema=EXPLODED_MEMBERS_SCHEMA)
    return distinct_keys(hits, "rel_id", limit=limit)


def way_member_nodes(
    ways: ray.data.Dataset, way_ids,
    limit: int = DEFAULT_BROADCAST_KEY_LIMIT,
) -> KeySet:
    """J6: distinct node ids referenced by the given ways
    (`src/sparql/QueryWriter.cpp:137-149`)."""
    sel = semi_join(explode_way_refs(ways), "way_id",
                    wrap_keys(way_ids, limit), schema=EXPLODED_WAYS_SCHEMA)
    return distinct_keys(sel, "node_id", limit=limit)


def relation_member_refs(
    relations: ray.data.Dataset, rel_ids,
    limit: int = DEFAULT_BROADCAST_KEY_LIMIT,
) -> tuple[KeySet, KeySet]:
    """J5: member (node_ids, way_ids) of the given relations, split by
    type (`src/sparql/QueryWriter.cpp:152-166`, parse
    `src/osm/OsmDataFetcher.cpp:413-433`)."""
    mem = semi_join(explode_relation_members(relations), "rel_id",
                    wrap_keys(rel_ids, limit),
                    schema=EXPLODED_MEMBERS_SCHEMA)
    nodes = mem.map_batches(
        lambda b: b.filter(pc.equal(b["type"], "node")), batch_format="pyarrow"
    )
    wys = mem.map_batches(
        lambda b: b.filter(pc.equal(b["type"], "way")), batch_format="pyarrow"
    )
    return (distinct_keys(nodes, "ref", limit=limit),
            distinct_keys(wys, "ref", limit=limit))


def node_locations(
    nodes: ray.data.Dataset, node_ids,
    limit: int = DEFAULT_BROADCAST_KEY_LIMIT,
) -> ray.data.Dataset:
    """J7: (node ids) -> (id, lon, lat); missing ids tolerated, the
    reference errors only on MORE rows than asked
    (`src/osm/OsmDataFetcher.cpp:108-142`) — uniqueness is asserted
    downstream in reconstruction."""
    return semi_join(
        nodes.select_columns(["id", "lon", "lat"]), "id",
        wrap_keys(node_ids, limit), schema=LOCATIONS_SCHEMA,
    )


def reconstruct_ways(exploded: ray.data.Dataset) -> ray.data.Dataset:
    """J8: (way_id, node_id, pos) rows -> ways(way_id, nd_refs sorted
    by pos). The reference does GROUP_CONCAT(...;';') then re-sorts by
    pos client-side (`src/osm/OsmDataFetcher.cpp:281-330`); here a
    hash-partitioned collect (one shuffle, per-PARTITION pandas — not
    per-way map_groups, which pays ~2 ms/group; see joins.py)."""
    from oluray.stages import joins

    def collect(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["way_id", "pos"], kind="mergesort")
        g = df.groupby("way_id")["node_id"].agg(list)
        return pd.DataFrame({"way_id": g.index.to_numpy(), "nd_refs": g.to_numpy()})

    return joins.partitioned_map(exploded, ["way_id"], collect, num_partitions=32,
                                 pre_repartition=False)


def reconstruct_relations(exploded: ray.data.Dataset) -> ray.data.Dataset:
    """J9: member rows -> relations(rel_id, members sorted by pos)."""
    from oluray.stages import joins

    def collect(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["rel_id", "pos"], kind="mergesort")
        recs = pd.DataFrame(
            {
                "m": [
                    {"ref": int(r), "type": t, "role": ro}
                    for r, t, ro in zip(df["ref"], df["type"], df["role"])
                ]
            },
            index=df.index,
        )
        g = recs["m"].groupby(df["rel_id"].to_numpy()).agg(list)
        return pd.DataFrame({"rel_id": g.index.to_numpy(), "members": g.to_numpy()})

    return joins.partitioned_map(exploded, ["rel_id"], collect, num_partitions=32,
                                 pre_repartition=False)
