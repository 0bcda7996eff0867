"""Full update pipeline: apply a merged OsmChange window to a
snapshot — the reference's complete run loop
(`/root/reference/src/osm/OsmChangeHandler.cpp:74-117`) re-expressed
as Ray Data dataflow:

  changes ─latest-wins merge (O1)─► per-kind op sets (M1/ST1)
      ─► snapshot delete+insert (modify = delete+reinsert,
         `:444-447,578-590`)
      ─► impact closure (J1-J3, anti-join vs change file)
      ─► context fetch (J5-J7 member refs + node locations)
      ─► geometry recompute (way centroid/cell — replaces the
         osm2rdf delegation) ─► geo delta rows
      ─► run counters (A4)

All set logic is broadcast semi/anti joins (the twelve in-heap id
sets of `include/osm/OsmChangeHandler.h:55-89` become key arrays in
the object store); nothing materializes the snapshot on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from oluray.functions import geo
from oluray.stages import closure
from oluray.stages.diff import merge_latest_wins


def _ids_of(merged: ray.data.Dataset, kind: str, ops: tuple[str, ...]) -> np.ndarray:
    sel = merged.map_batches(
        lambda t, kind=kind, ops=ops: t.filter(
            pc.and_(pc.equal(t["kind"], kind), pc.is_in(t["op"], value_set=pa.array(ops)))
        ),
        batch_format="pyarrow",
    )
    return closure.distinct_ids(sel, "id")


def _payload_nodes(merged: ray.data.Dataset) -> ray.data.Dataset:
    """created|modified node rows -> nodes-schema rows."""

    def fn(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.equal(t["kind"], "node"),
                pc.is_in(t["op"], value_set=pa.array(["create", "modify"])),
            )
        )
        p = t.column("payload").combine_chunks()
        return pa.table(
            {
                "id": t["id"],
                "lon": p.field("lon"),
                "lat": p.field("lat"),
                "tags": p.field("tags"),
                "version": t["version"],
                "ts": t["ts"],
            }
        )

    return merged.map_batches(fn, batch_format="pyarrow")


def _payload_ways(merged: ray.data.Dataset) -> ray.data.Dataset:
    def fn(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.equal(t["kind"], "way"),
                pc.is_in(t["op"], value_set=pa.array(["create", "modify"])),
            )
        )
        p = t.column("payload").combine_chunks()
        return pa.table(
            {
                "id": t["id"],
                "nd_refs": p.field("nd_refs"),
                "tags": p.field("tags"),
                "version": t["version"],
                "ts": t["ts"],
            }
        )

    return merged.map_batches(fn, batch_format="pyarrow")


def _payload_relations(merged: ray.data.Dataset) -> ray.data.Dataset:
    def fn(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.equal(t["kind"], "relation"),
                pc.is_in(t["op"], value_set=pa.array(["create", "modify"])),
            )
        )
        p = t.column("payload").combine_chunks()
        tags = p.field("tags")
        # relation `type` comes from its tags (multipolygon predicate M2)
        types = []
        for row in tags.to_pylist():
            types.append(dict(row).get("type") if row else None)
        return pa.table(
            {
                "id": t["id"],
                "members": p.field("members"),
                "type": pa.array(types, pa.string()),
                "tags": tags,
                "version": t["version"],
                "ts": t["ts"],
            }
        )

    return merged.map_batches(fn, batch_format="pyarrow")


def apply_update(
    nodes: ray.data.Dataset,
    ways: ray.data.Dataset,
    relations: ray.data.Dataset,
    changes: ray.data.Dataset,
    cell_res: int = 12,
) -> dict:
    """Apply one change window. Returns dict with the new snapshot
    (`nodes`, `ways`, `relations`), `geo_delta` (recomputed geometry
    rows for changed + impacted elements), and `counts` (A4)."""
    merged = merge_latest_wins(changes)

    # membership sets (ST1) as broadcast key arrays
    del_or_mod = ("modify", "delete")
    node_in_cf = _ids_of(merged, "node", ("create", "modify", "delete"))
    way_in_cf = _ids_of(merged, "way", ("create", "modify", "delete"))
    rel_in_cf = _ids_of(merged, "relation", ("create", "modify", "delete"))
    modified_nodes = _ids_of(merged, "node", del_or_mod)

    # delete-then-insert snapshot update (idempotent per window). The
    # anti set is ALL changed ids — a superset of the reference's
    # deleted+modified (`:444-447`) that also makes create-on-existing
    # safe instead of duplicating rows.
    nodes2 = closure.anti_join(nodes, "id", closure.broadcast_keys(node_in_cf)).union(
        _payload_nodes(merged)
    )
    ways2 = closure.anti_join(ways, "id", closure.broadcast_keys(way_in_cf)).union(
        _payload_ways(merged)
    )
    relations2 = closure.anti_join(
        relations, "id", closure.broadcast_keys(rel_in_cf)
    ).union(_payload_relations(merged))

    # impact closure on the NEW snapshot (geometry of unchanged ways/
    # relations referencing changed nodes must be recomputed)
    ways_geo = closure.ways_to_update_geometry(ways2, modified_nodes, way_in_cf)
    rels_geo = closure.relations_to_update_geometry(
        relations2, modified_nodes, np.union1d(ways_geo, way_in_cf), rel_in_cf
    )

    # context fetch + geometry recompute: way centroid from member
    # node locations (replaces the osm2rdf delegation)
    touched_ways = np.union1d(
        ways_geo, _ids_of(merged, "way", ("create", "modify"))
    )
    member_nodes = closure.way_member_nodes(ways2, touched_ways)
    locs = closure.node_locations(nodes2, member_nodes)
    loc_map_ref = ray.put(
        {
            int(r["id"]): (r["lon"], r["lat"])
            for b in locs.iter_batches(batch_format="pandas")
            for r in b.to_dict("records")
        }
    )

    def way_centroids(t: pa.Table) -> pa.Table:
        locmap = ray.get(loc_map_ref)
        ids, lons, lats = [], [], []
        refs = t["nd_refs"].to_pylist()
        for i, wid in enumerate(t["id"].to_pylist()):
            pts = [locmap[r] for r in (refs[i] or []) if r in locmap]
            if not pts:
                continue
            ids.append(wid)
            lons.append(float(np.mean([p[0] for p in pts])))
            lats.append(float(np.mean([p[1] for p in pts])))
        cells = geo.cell_encode(np.array(lons, dtype=np.float64),
                                np.array(lats, dtype=np.float64), cell_res) if ids else np.array([], np.int64)
        return pa.table(
            {
                "kind": pa.array(["way"] * len(ids)),
                "id": pa.array(ids, pa.int64()),
                "lon": pa.array(lons, pa.float64()),
                "lat": pa.array(lats, pa.float64()),
                "cell": pa.array(cells),
            }
        )

    way_delta = closure.semi_join(
        ways2, "id", closure.broadcast_keys(touched_ways)
    ).map_batches(way_centroids, batch_format="pyarrow")

    def node_delta_fn(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "kind": pa.array(["node"] * t.num_rows),
                "id": t["id"],
                "lon": t["lon"],
                "lat": t["lat"],
                "cell": pa.array(geo.cell_encode(lon, lat, cell_res)),
            }
        )

    node_delta = closure.semi_join(
        nodes2, "id", closure.broadcast_keys(_ids_of(merged, "node", ("create", "modify")))
    ).map_batches(node_delta_fn, batch_format="pyarrow")

    geo_delta = node_delta.union(way_delta)

    counts = merged.groupby(["op", "kind"]).count()
    return {
        "nodes": nodes2,
        "ways": ways2,
        "relations": relations2,
        "geo_delta": geo_delta,
        "impacted_ways": ways_geo,
        "impacted_relations": rels_geo,
        "counts": counts,
    }
