"""Deterministic synthetic fixtures (seeded; no external data).

Mirrors the reference's test corpus (`/root/reference/tests/data/`) as
Arrow tables per FIXTURES.md:

- `images` — the north-rule payload table
  (image_id, bytes, w, h, fmt, caption, phash); pixel content is a
  seeded gradient+noise raster, encoded with the in-repo codecs
  (real PNG; deterministic fake lossy for "jpeg").
- `changes` — OsmChange-equivalent diff rows (op, kind, id, version,
  ts, payload) incl. the reference's tricky cases: modify-then-delete
  of one element in one window (`src/osm/OsmUpdater.cpp:119-168`
  latest-wins), ways referencing nodes outside the diff
  (`tests/data/wayWithReferences.osm`), a multipolygon relation
  (`src/util/OsmObjectHelper.cpp:12-23`), XML-entity-stress tags.
- `nodes`/`ways`/`relations` — the snapshot the diff applies to.
- `change_polys` — changeset-derived polygons (convex + concave; no
  antimeridian crossing in v0), incl. a dense cluster for skew tests
  and an empty polygon (zero images inside).

Every generator is a pure function of (n, seed).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from oluray.functions import geo
from oluray.functions.imagecodec import encode

SIZES = (32, 64, 48)  # (h==w per FIXTURES; cycle)
FMTS = ("png", "jpeg")

_CAPTION_WORDS = (
    "harbor bridge skyline alley forest river plaza market tower garden "
    "&amp; <tag> \"quoted\" 'tick' line\nbreak tab\there meadow dune cliff"
).split(" ")


def _pixels(i: int, w: int, h: int, seed: int) -> np.ndarray:
    """Seeded gradient + noise raster, (h, w, 3) uint8."""
    rng = np.random.default_rng(np.uint64(seed) ^ np.uint64(i * 2654435761 % 2**63))
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            ((xx + yy) * 255 // max(w + h - 2, 1)),
        ],
        axis=-1,
    ).astype(np.int32)
    noise = rng.integers(-16, 17, size=(h, w, 3), dtype=np.int32)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


# phash64 lives beside the codecs (oluray.functions.imagecodec) —
# production stages must not depend on this fixtures module;
# re-exported here for back-compat
from oluray.functions.imagecodec import phash64  # noqa: E402,F401


def caption_for(i: int, seed: int) -> str:
    rng = np.random.default_rng(np.uint64(seed) ^ np.uint64(i))
    words = [ _CAPTION_WORDS[int(k)] for k in rng.integers(0, len(_CAPTION_WORDS), 4) ]
    return f"caption {i} " + " ".join(words)


def make_images(n: int, seed: int = 42) -> pa.Table:
    ids, blobs, ws, hs, fmts, caps, hashes = [], [], [], [], [], [], []
    for i in range(n):
        w = h = SIZES[i % len(SIZES)]
        fmt = FMTS[i % len(FMTS)]
        px = _pixels(i, w, h, seed)
        ids.append(f"img{i:08d}")
        blobs.append(encode(px, fmt))
        ws.append(w)
        hs.append(h)
        fmts.append(fmt)
        caps.append(caption_for(i, seed))
        hashes.append(phash64(px))
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(caps, pa.string()),
            "phash": pa.array(hashes, pa.int64()),
        }
    )


def footprint_from_phash(phash: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """FIXTURES.md §1: lon/lat from phash, quantized to 1e-7 deg
    (the reference's 7-dp contract, `src/osm/Node.cpp:27,44-51`).
    Integer-exact microdegree arithmetic (same style as
    geo.derive_lonlat) so goldens are stable."""
    ph = np.asarray(phash, dtype=np.int64).view(np.uint64)
    lo = ph & np.uint64(0xFFFFFFFF)
    hi = (ph >> np.uint64(32)) & np.uint64(0xFFFFFFFF)
    lon_u = (lo * np.uint64(3600000000)) // np.uint64(2**32)
    lat_u = (hi * np.uint64(1700000000)) // np.uint64(2**32)
    return -180.0 + lon_u.astype(np.float64) / 1e7, -85.0 + lat_u.astype(np.float64) / 1e7


# ---------------------------------------------------------------------------
# diff + snapshot tables
# ---------------------------------------------------------------------------

_PAYLOAD_T = pa.struct(
    [
        ("lon", pa.float64()),
        ("lat", pa.float64()),
        ("nd_refs", pa.list_(pa.int64())),
        (
            "members",
            pa.list_(
                pa.struct([("ref", pa.int64()), ("type", pa.string()), ("role", pa.string())])
            ),
        ),
        ("tags", pa.map_(pa.string(), pa.string())),
    ]
)

CHANGES_SCHEMA = pa.schema(
    [
        ("op", pa.string()),
        ("kind", pa.string()),
        ("id", pa.int64()),
        ("version", pa.int64()),
        ("ts", pa.timestamp("ms")),
        ("payload", _PAYLOAD_T),
    ]
)


def _payload(lon=None, lat=None, nd_refs=None, members=None, tags=None):
    return {
        "lon": lon,
        "lat": lat,
        "nd_refs": nd_refs,
        "members": members,
        "tags": list(tags.items()) if tags else None,
    }


def make_changes(n: int, seed: int = 42) -> pa.Table:
    """Diff table with duplicated (kind,id)@multiple versions, a
    modify-then-delete node, reference-closure way, multipolygon
    relation, XML-entity tag values."""
    rng = np.random.default_rng(seed)
    rows = []
    t0 = 1_700_000_000_000
    ops = ("create", "modify", "delete")
    all_lon, all_lat = geo.derive_lonlat(np.arange(1000, 1000 + n, dtype=np.int64))
    for i in range(n):
        nid = 1000 + i
        op = ops[int(rng.integers(0, 3))]
        lon, lat = all_lon[i : i + 1], all_lat[i : i + 1]
        rows.append(
            dict(
                op=op, kind="node", id=nid, version=1 + int(rng.integers(0, 3)),
                ts=t0 + i * 1000,
                payload=_payload(lon=float(lon[0]), lat=float(lat[0]),
                                 tags={"name": f"n&<{i}>"}),
            )
        )
    # duplicate versions of node 1000: v1 create, v2 modify, v3 delete (latest wins)
    for v, op in ((1, "create"), (2, "modify"), (3, "delete")):
        lon, lat = geo.derive_lonlat(np.array([1000]))
        rows.append(
            dict(op=op, kind="node", id=1000, version=v, ts=t0 + 10_000 + v,
                 payload=_payload(lon=float(lon[0]), lat=float(lat[0])))
        )
    # a way referencing nodes NOT in the diff (closure case)
    rows.append(
        dict(op="modify", kind="way", id=5000, version=2, ts=t0 + 20_000,
             payload=_payload(nd_refs=[1000, 1001, 99_001, 99_002],
                              tags={"highway": "primary"}))
    )
    rows.append(
        dict(op="create", kind="way", id=5001, version=1, ts=t0 + 21_000,
             payload=_payload(nd_refs=[1002, 1003, 1004]))
    )
    # relation with mixed members incl. empty role; one multipolygon
    rows.append(
        dict(op="modify", kind="relation", id=7000, version=3, ts=t0 + 30_000,
             payload=_payload(members=[
                 {"ref": 5000, "type": "way", "role": "outer"},
                 {"ref": 1005, "type": "node", "role": ""},
             ], tags={"type": "multipolygon"}))
    )
    rows.append(
        dict(op="create", kind="relation", id=7001, version=1, ts=t0 + 31_000,
             payload=_payload(members=[{"ref": 5001, "type": "way", "role": "outer"}],
                              tags={"type": "route", "note": 'a"b\'c\nd'}))
    )
    return pa.Table.from_pylist(rows, schema=CHANGES_SCHEMA)


NODES_SCHEMA = pa.schema(
    [
        ("id", pa.int64()), ("lon", pa.float64()), ("lat", pa.float64()),
        ("tags", pa.map_(pa.string(), pa.string())),
        ("version", pa.int64()), ("ts", pa.timestamp("ms")),
    ]
)
WAYS_SCHEMA = pa.schema(
    [
        ("id", pa.int64()), ("nd_refs", pa.list_(pa.int64())),
        ("tags", pa.map_(pa.string(), pa.string())),
        ("version", pa.int64()), ("ts", pa.timestamp("ms")),
    ]
)
RELATIONS_SCHEMA = pa.schema(
    [
        ("id", pa.int64()),
        ("members", pa.list_(pa.struct(
            [("ref", pa.int64()), ("type", pa.string()), ("role", pa.string())]))),
        ("type", pa.string()),
        ("tags", pa.map_(pa.string(), pa.string())),
        ("version", pa.int64()), ("ts", pa.timestamp("ms")),
    ]
)


def make_snapshot(n_nodes: int = 200, seed: int = 42):
    """(nodes, ways, relations) snapshot; some ways/relations hit the
    diff's modified nodes (closure hits), some don't (anti misses)."""
    rng = np.random.default_rng(seed + 1)
    node_ids = np.concatenate(
        [np.arange(1000, 1000 + n_nodes // 2), np.arange(99_000, 99_000 + n_nodes // 2)]
    ).astype(np.int64)
    lon, lat = geo.derive_lonlat(node_ids)
    t0 = 1_690_000_000_000
    nodes = pa.Table.from_pylist(
        [
            dict(id=int(i), lon=float(x), lat=float(y), tags=None, version=1,
                 ts=t0 + int(i))
            for i, x, y in zip(node_ids, lon, lat)
        ],
        schema=NODES_SCHEMA,
    )
    ways = []
    for wi in range(40):
        wid = 5000 + wi
        k = 3 + int(rng.integers(0, 4))
        refs = [int(node_ids[int(j)]) for j in rng.integers(0, len(node_ids), k)]
        ways.append(dict(id=wid, nd_refs=refs, tags=[("ref", str(wi))], version=1,
                         ts=t0 + wi))
    ways_t = pa.Table.from_pylist(ways, schema=WAYS_SCHEMA)
    rels = []
    for ri in range(12):
        rid = 7000 + ri
        members = [
            {"ref": 5000 + int(rng.integers(0, 40)), "type": "way", "role": "outer"},
            {"ref": int(node_ids[int(rng.integers(0, len(node_ids)))]), "type": "node",
             "role": "" if ri % 2 else "admin_centre"},
        ]
        rels.append(dict(id=rid, members=members,
                         type="multipolygon" if ri % 3 == 0 else "route",
                         tags=None, version=1, ts=t0 + ri))
    rels_t = pa.Table.from_pylist(rels, schema=RELATIONS_SCHEMA)
    return nodes, ways_t, rels_t


POLYS_SCHEMA = pa.schema(
    [
        ("poly_id", pa.int64()),
        ("op", pa.string()),
        ("ring", pa.list_(pa.struct([("lon", pa.float64()), ("lat", pa.float64())]))),
    ]
)


def make_change_polys(
    n: int, seed: int = 42, span_deg: float = 20.0, centers=None
) -> pa.Table:
    """n changeset polygons: convex (irregular k-gons, no horizontal
    edges), one concave star, one dense-cluster target near (0,0),
    one far-away empty polygon. ops cycle create/modify/delete.
    `centers`: optional [(lon, lat), ...] anchoring polygon centers
    (e.g. on actual image footprints so joins have hits)."""
    rng = np.random.default_rng(seed + 7)
    rows = []
    ops = ("create", "modify", "delete")
    for p in range(n):
        if centers is not None and p < len(centers):
            cx, cy = float(centers[p][0]), float(centers[p][1])
        else:
            cx = float(rng.uniform(-150, 150))
            cy = float(rng.uniform(-70, 70))
        k = 5 + int(rng.integers(0, 4))
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        rad = rng.uniform(0.3, 1.0, k) * span_deg / 2
        if p == 1:  # concave star
            rad = np.where(np.arange(k) % 2 == 0, rad, rad * 0.35)
        anchored = centers is not None and p < len(centers)
        if p == 2 and not anchored:  # dense cluster target: centered at origin
            cx, cy = 0.0, 0.0
        if p == 3 and not anchored:  # empty polygon: tiny, mid-ocean
            cx, cy, rad = -140.0, -60.0, np.full(k, 0.01)
        lons = cx + rad * np.cos(ang)
        lats = cy + rad * np.sin(ang)
        # nudge any horizontal edges (equal consecutive lats) — keeps
        # the ray-casting SQL free of division-by-zero edges. Round
        # FIRST (rounding could re-create an equality the nudge just
        # fixed), then sweep until stable: nudging one vertex can
        # collide it with its other neighbor (r2 review)
        lons = np.round(lons, 7)
        lats = np.round(lats, 7)
        for _ in range(k + 1):
            changed = False
            for i in range(k):
                if lats[i] == lats[(i + 1) % k]:
                    lats[i] = np.round(lats[i] + 1e-6, 7)
                    changed = True
            if not changed:
                break
        ring = [{"lon": float(a), "lat": float(b)} for a, b in zip(lons, lats)]
        rows.append(dict(poly_id=p, op=ops[p % 3], ring=ring))
    return pa.Table.from_pylist(rows, schema=POLYS_SCHEMA)
