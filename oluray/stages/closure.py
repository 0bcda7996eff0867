"""Impact closure: which unchanged elements need geometry recompute.

Reimplements the reference's SPARQL reverse-reference queries (J1-J10,
`/root/reference/src/sparql/QueryWriter.cpp:63-255`, drivers
`src/osm/OsmChangeHandler.cpp:217-341`) as local Ray Data operators:

- **explode** of `nd_refs` / `members` list columns via
  `pyarrow.compute.list_flatten` + `list_parent_indices` (zero-copy);
- **semi/anti joins** against the (small) changed-id sets via a
  broadcast key set (`ray.put` once, `pc.is_in` per batch) — the
  reference pays one SPARQL round-trip per <=1024 ids
  (`src/osm/OsmChangeHandler.cpp:37,41-53`); we pay zero shuffles.
  Scale note: the changed-id set of one replication window is tiny
  relative to the snapshot (minutes of edits vs the planet). If it
  ever outgrows a broadcast, swap this module's broadcast filters for
  `oluray.stages.joins.semi_join` (hash-partitioned both-sides semi /
  anti join — same semantics, no broadcast assumption).
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


def semi_join(ds: ray.data.Dataset, col: str, keys_ref) -> ray.data.Dataset:
    """Rows whose `col` is in the broadcast key set (J1/J2/J3 shape)."""

    def fn(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        return batch.filter(pc.is_in(batch[col], value_set=pa.array(keys, pa.int64())))

    return ds.map_batches(fn, batch_format="pyarrow")


def anti_join(ds: ray.data.Dataset, col: str, keys_ref) -> ray.data.Dataset:
    """Rows whose `col` is NOT in the broadcast key set — the
    reference's 'except those already in the change file' filters
    (`src/osm/OsmChangeHandler.cpp:224-226,240-243,257-260`)."""

    def fn(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        mask = pc.invert(pc.is_in(batch[col], value_set=pa.array(keys, pa.int64())))
        return batch.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")


def distinct_ids(ds: ray.data.Dataset, col: str) -> np.ndarray:
    """A3 distinct ids of a (small, already-filtered) result —
    materialized to the driver as the next stage's broadcast set."""
    vals = []
    for batch in ds.select_columns([col]).iter_batches(batch_format="pyarrow"):
        vals.append(batch[col].to_numpy(zero_copy_only=False))
    if not vals:
        return np.array([], dtype=np.int64)
    return np.unique(np.concatenate(vals)).astype(np.int64)


def ways_to_update_geometry(
    ways: ray.data.Dataset, modified_node_ids, ways_in_changefile
) -> np.ndarray:
    """J1: ids of ways referencing any modified node, minus ways
    already in the change file (`src/sparql/QueryWriter.cpp:169-184`,
    driver `src/osm/OsmChangeHandler.cpp:217-230`)."""
    nref = broadcast_keys(modified_node_ids)
    hits = semi_join(explode_way_refs(ways), "node_id", nref)
    wref = broadcast_keys(ways_in_changefile)
    hits = anti_join(hits, "way_id", wref)
    return distinct_ids(hits, "way_id")


def relations_to_update_geometry(
    relations: ray.data.Dataset,
    modified_node_ids,
    touched_way_ids,
    relations_in_changefile,
) -> np.ndarray:
    """J2+J3: relations referencing modified nodes or touched ways,
    minus relations already in the change file
    (`src/sparql/QueryWriter.cpp:187-220`, driver `:232-262`)."""
    mem = explode_relation_members(relations)
    node_hits = semi_join(
        mem.map_batches(
            lambda b: b.filter(pc.equal(b["type"], "node")), batch_format="pyarrow"
        ),
        "ref",
        broadcast_keys(modified_node_ids),
    )
    way_hits = semi_join(
        mem.map_batches(
            lambda b: b.filter(pc.equal(b["type"], "way")), batch_format="pyarrow"
        ),
        "ref",
        broadcast_keys(touched_way_ids),
    )
    hits = node_hits.union(way_hits)
    hits = anti_join(hits, "rel_id", broadcast_keys(relations_in_changefile))
    return distinct_ids(hits, "rel_id")


def way_member_nodes(ways: ray.data.Dataset, way_ids) -> np.ndarray:
    """J6: distinct node ids referenced by the given ways
    (`src/sparql/QueryWriter.cpp:137-149`)."""
    sel = semi_join(explode_way_refs(ways), "way_id", broadcast_keys(way_ids))
    return distinct_ids(sel, "node_id")


def relation_member_refs(
    relations: ray.data.Dataset, rel_ids
) -> tuple[np.ndarray, np.ndarray]:
    """J5: member (node_ids, way_ids) of the given relations, split by
    type (`src/sparql/QueryWriter.cpp:152-166`, parse
    `src/osm/OsmDataFetcher.cpp:413-433`)."""
    mem = semi_join(explode_relation_members(relations), "rel_id", broadcast_keys(rel_ids))
    nodes = mem.map_batches(
        lambda b: b.filter(pc.equal(b["type"], "node")), batch_format="pyarrow"
    )
    wys = mem.map_batches(
        lambda b: b.filter(pc.equal(b["type"], "way")), batch_format="pyarrow"
    )
    return distinct_ids(nodes, "ref"), distinct_ids(wys, "ref")


def node_locations(nodes: ray.data.Dataset, node_ids) -> ray.data.Dataset:
    """J7: (node ids) -> (id, lon, lat); missing ids tolerated, the
    reference errors only on MORE rows than asked
    (`src/osm/OsmDataFetcher.cpp:108-142`) — uniqueness is asserted
    downstream in reconstruction."""
    return semi_join(
        nodes.select_columns(["id", "lon", "lat"]), "id", broadcast_keys(node_ids)
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
