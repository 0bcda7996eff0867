"""TTL (Turtle) line codec — the reference's RDF triple layer as
vectorized Arrow kernels.

Covers the SURVEY.md §2 items that rounds 1-2 had eliminated by
schema (the engine's own pipelines still use typed columns; this
module exists so a user of the reference's osm2rdf -> TTL -> SPARQL
flow can run the same triple filtering here):

- M10 triple splitter      — `split_triples`
  (`/root/reference/src/util/TtlHelper.cpp:13-21`: regex
  `(\\S+)\\s(\\S+)\\s(.*)\\s\\.` via regex_search).
- M11 namespace/id         — `relevant_namespace_mask`,
  `id_from_subject`
  (`/root/reference/src/util/TtlHelper.cpp:23-38,62-82`; note the
  per-type geometry-namespace alternatives `osm_node_`,
  `osm_node_centroid_`, `osm_wayarea_`, `osm_relarea_`).
- M12 link predicates      — `link_predicate_mask`
  (`/root/reference/src/util/TtlHelper.cpp:40-60`).
- M9-analog emitters       — `element_lines`, `way_member_lines`
  (osm2rdf-flavored output, shape of
  `/root/reference/tests/data/node.ttl:21-38`).

All kernels are pure pyarrow.compute over string arrays — no Python
row loops; the Dataset stages live in `oluray.stages.ttl`.
"""

from __future__ import annotations

import re as _re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

ELEMENT_TYPES = ("node", "way", "relation")

# isRelevantNamespace (TtlHelper.cpp:23-38)
NAMESPACE_PREFIX = {"node": "osmnode:", "way": "osmway:", "relation": "osmrel:"}

# getIdFromSubject (TtlHelper.cpp:62-82) — alternatives include the
# osm2rdf geometry namespaces so `osm2rdfgeom:osm_node_centroid_7`
# resolves to node 7, `osm2rdfgeom:osm_wayarea_5` to way 5, etc.
ID_PATTERN = {
    "node": r"(?:osmnode:|osm_node_centroid_|osm_node_)(?P<id>\d+)",
    "way": r"(?:osmway:|osm_wayarea_)(?P<id>\d+)",
    "relation": r"(?:osmrel:|osm_relarea_)(?P<id>\d+)",
}

# hasRelevantObject (TtlHelper.cpp:40-60)
LINK_PREDICATES = {
    "node": ("geo:hasCentroid", "geo:hasGeometry"),
    "way": ("osmway:node", "geo:hasCentroid", "geo:hasGeometry"),
    "relation": ("osmrel:member", "geo:hasCentroid", "geo:hasGeometry"),
}

# getTriple (TtlHelper.cpp:14): subject = first token, predicate =
# second, object = everything up to the final " ." (greedy, so
# objects may contain spaces and quoted literals).
TRIPLE_PATTERN = r"(?P<s>\S+)\s(?P<p>\S+)\s(?P<o>.*)\s\."


class TtlError(ValueError):
    """Mirror of the reference's TtlHelperException."""


def split_triples(lines: pa.Array | pa.ChunkedArray) -> pa.Table:
    """M10: TTL line -> (s, p, o) columns. Raises on unsplittable
    lines like the reference (`TtlHelper.cpp:19-20`)."""
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    ext = pc.extract_regex(lines, TRIPLE_PATTERN)
    bad = pc.is_null(ext)
    if pc.any(bad).as_py():
        sample = lines.filter(bad)[0].as_py()
        raise TtlError(f"Cant split triple: {sample}")
    return pa.table(
        {
            "s": pc.struct_field(ext, "s"),
            "p": pc.struct_field(ext, "p"),
            "o": pc.struct_field(ext, "o"),
        }
    )


def relevant_namespace_mask(subjects, osm_type: str) -> pa.Array:
    """M11 `isRelevantNamespace`: element-namespace test per type."""
    return pc.starts_with(subjects, NAMESPACE_PREFIX[osm_type])


def id_from_subject(subjects, osm_type: str, strict: bool = True) -> pa.Array:
    """M11 `getIdFromSubject`: extract the element id (int64) from an
    element or geometry-namespace subject. With `strict`, raises on a
    non-matching subject like the reference (`TtlHelper.cpp:80-81`);
    otherwise yields null."""
    ext = pc.extract_regex(subjects, ID_PATTERN[osm_type])
    ids = pc.struct_field(ext, "id")
    if strict:
        bad = pc.is_null(ids)
        if pc.any(bad).as_py():
            sample = pa.array(subjects).filter(bad)[0].as_py()
            raise TtlError(f"Cant get id for {osm_type} from triple: {sample}")
    return pc.cast(ids, pa.int64())


def link_predicate_mask(predicates, osm_type: str) -> pa.Array:
    """M12 `hasRelevantObject`: does this predicate's object start a
    linked block (geometry subject / member blank node) that inherits
    relevance?"""
    return pc.is_in(
        predicates, value_set=pa.array(LINK_PREDICATES[osm_type], pa.string())
    )


# ---------------------------------------------------------------------------
# emitters (osm2rdf output flavor — tests/data/node.ttl)
# ---------------------------------------------------------------------------

_GEOM_NS = {"node": "osm_node_", "way": "osm_wayarea_", "relation": "osm_relarea_"}


def _concat(*parts) -> pa.Array:
    return pc.binary_join_element_wise(*parts, "")


def _ids_str(ids) -> pa.Array:
    return pc.cast(pa.array(np.asarray(ids, dtype=np.int64)), pa.string())


def format_wkt_point(lon, lat) -> np.ndarray:
    """7-dp POINT serializer (M8 flavor, `osm2rdf` WKT literals)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    out = [f"POINT({x:.7f} {y:.7f})" for x, y in zip(lon, lat)]
    return np.asarray(out, dtype=object)


def element_lines(
    osm_type: str,
    ids,
    lon=None,
    lat=None,
    tags: dict[str, "pa.Array | np.ndarray"] | None = None,
) -> list[pa.Array]:
    """Emit the osm2rdf-shaped line block for a vector of elements:

        <ns><id> rdf:type osm:<type> .
        <ns><id> osmkey:<k> "<v>" .            (per tag column)
        <ns><id> geo:hasGeometry osm2rdfgeom:<geomns><id> .
        osm2rdfgeom:<geomns><id> geo:asWKT "POINT(..)"^^geo:wktLiteral .

    Returns one string array per line kind (same length as `ids`);
    callers interleave / flatten as needed. Tag values are emitted
    verbatim — pre-encode with `xmlcodec.xml_encode_series` to match
    osm2rdf, which writes XML-encoded literals that
    `filterRelevantTriples` decodes on read
    (`/root/reference/src/osm/OsmChangeHandler.cpp:609-612`).
    """
    ns = NAMESPACE_PREFIX[osm_type]
    sid = _ids_str(ids)
    subj = _concat(ns, sid)
    out = [_concat(subj, " rdf:type osm:", osm_type, " .")]
    for key, vals in (tags or {}).items():
        va = pa.array(np.asarray(vals, dtype=object), pa.string())
        out.append(_concat(subj, " osmkey:", key, ' "', va, '" .'))
    if lon is not None:
        geom = _concat("osm2rdfgeom:", _GEOM_NS[osm_type], sid)
        out.append(_concat(subj, " geo:hasGeometry ", geom, " ."))
        wkt = pa.array(format_wkt_point(lon, lat), pa.string())
        out.append(_concat(geom, ' geo:asWKT "', wkt, '"^^geo:wktLiteral .'))
    return out


def way_member_lines(way_ids, node_ids) -> pa.Array:
    """`osmway:<w> osmway:node osmnode:<n> .` member link lines."""
    return _concat(
        "osmway:", _ids_str(way_ids), " osmway:node osmnode:", _ids_str(node_ids), " ."
    )


# ---------------------------------------------------------------------------
# osm2rdf-parity element emission (VERDICT r4 item 3)
#
# Produces the element + geometry triples the reference's vendored
# osm2rdf converter writes (`/root/reference/src/osm/Osm2ttl.cpp:38-133`
# runs osm2rdf in QLEVER format; the output contract is the three
# goldens `/root/reference/tests/data/{node,way,relation}.ttl`).
# Format details pinned from the goldens, NOT from osm2rdf source:
#   - header: the fixed 20-line @prefix block (TTL_PREFIXES)
#   - node:  rdf:type, osmmeta:timestamp, osmkey tags, osm2rdf:facts
#            (= tag count), geo:hasGeometry osm2rdfgeom:osm_node_<id>,
#            asWKT POINT, convex_hull/envelope/obb (degenerate 5-point
#            ring for a point)   [node.ttl:21-37]
#   - way:   same head; geometry subject is osm2rdf:way_<id> (NOT
#            osm2rdfgeom:), asWKT LINESTRING over nd-ordered coords,
#            hull/envelope/obb rings, osm2rdf:length = planar degree
#            length %.6f   [way.ttl way block]
#   - rel:   same head; members as blank nodes `_:<label>_<pos>` with
#            osm2rdfmember:id/role/pos; empty role -> "member"; no
#            geometry triples for unresolved members  [relation.ttl]
# Coordinates: exactly 7 decimal places (the M8 contract).
# Ring orders pinned from the goldens: hull = CW starting at the
# leftmost vertex (the CCW monotone chain reversed), closed; envelope
# = (minlon,minlat),(minlon,maxlat),(maxlon,maxlat),(maxlon,minlat),
# closed; obb = rectangle aligned to the FIRST edge of the CW hull,
# corners (umax,vmax),(umax,vmin),(umin,vmin),(umin,vmax) in the
# edge frame, closed — this reproduces way.ttl exactly; it is a
# single-sample contract (osm2rdf is not vendored in the reference)
# and documented as such. Degenerate hulls (<3 distinct vertices)
# fall back to the envelope ring, which reproduces node.ttl.
# ---------------------------------------------------------------------------

TTL_PREFIXES = [
    '@prefix ohmnode: <https://www.openhistoricalmap.org/node/> .',
    '@prefix osmrel: <https://www.openstreetmap.org/relation/> .',
    '@prefix osmnode: <https://www.openstreetmap.org/node/> .',
    '@prefix osmkey: <https://www.openstreetmap.org/wiki/Key:> .',
    '@prefix osmway: <https://www.openstreetmap.org/way/> .',
    '@prefix osmmeta: <https://www.openstreetmap.org/meta/> .',
    '@prefix osm: <https://www.openstreetmap.org/> .',
    '@prefix osm2rdfmeta: <https://osm2rdf.cs.uni-freiburg.de/rdf/meta#> .',
    '@prefix ohmrel: <https://www.openhistoricalmap.org/relation/> .',
    '@prefix osm2rdfmember: <https://osm2rdf.cs.uni-freiburg.de/rdf/member#> .',
    '@prefix osm2rdfkey: <https://osm2rdf.cs.uni-freiburg.de/rdf/key#> .',
    '@prefix osm2rdfgeom: <https://osm2rdf.cs.uni-freiburg.de/rdf/geom#> .',
    '@prefix ohmway: <https://www.openhistoricalmap.org/way/> .',
    '@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .',
    '@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .',
    '@prefix ohm: <https://www.openhistoricalmap.org/> .',
    '@prefix wd: <http://www.wikidata.org/entity/> .',
    '@prefix osm2rdf: <https://osm2rdf.cs.uni-freiburg.de/rdf#> .',
    '@prefix ogc: <http://www.opengis.net/rdf#> .',
    '@prefix geo: <http://www.opengis.net/ont/geosparql#> .',
]

_TYPE_NS = {"node": "osmnode", "way": "osmway", "relation": "osmrel"}


def fmt7(a) -> np.ndarray:
    """%.7f vector formatter (the 7-dp coordinate contract)."""
    return np.char.mod("%.7f", np.asarray(a, np.float64))


def ts_literal_ms(ts_ms: np.ndarray) -> np.ndarray:
    """timestamp[ms] int64 -> 'YYYY-MM-DDTHH:MM:SS' strings."""
    secs = (np.asarray(ts_ms, np.int64) // 1000).astype("datetime64[s]")
    return np.datetime_as_string(secs, unit="s")


_TTL_ESC = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r",
            "\t": "\\t"}
# every OTHER line-breaking / C0 control char must be \uXXXX-escaped
# too: the reference consumes TTL line-by-line
# (`/root/reference/src/osm/OsmChangeHandler.cpp:599-604`), so a raw
# form feed / vertical tab / U+2028 inside a literal would split one
# triple across "lines" (found by the emit->parse hypothesis test)
_TTL_ESC_RE = _re.compile(
    '[\\\\"\n\r\t\x00-\x08\x0b\x0c\x0e-\x1f\x85\u2028\u2029]'
)


def _ttl_esc_one(m) -> str:
    ch = m.group(0)
    return _TTL_ESC.get(ch) or "\\u%04X" % ord(ch)


def turtle_escape(vals) -> np.ndarray:
    """Escape Turtle string-literal metachars: backslash, quote, the
    named control escapes, and \\uXXXX for every other C0 control or
    unicode line break (unexercised by the goldens, which carry
    XML-encoded values; standard Turtle escaping)."""
    return np.array(
        [_TTL_ESC_RE.sub(_ttl_esc_one, v) if v is not None else v
         for v in np.asarray(vals, dtype=object)],
        dtype=object,
    )


def _ring_cw_closed(lon: np.ndarray, lat: np.ndarray):
    """CW closed hull ring in golden order, or None if degenerate."""
    from oluray.functions.geo import convex_hull

    hx, hy = convex_hull(np.asarray(lon, np.float64),
                         np.asarray(lat, np.float64))
    if len(hx) < 3:
        return None
    # CCW chain starts at the leftmost vertex; golden = same start,
    # reversed direction (CW), closed
    cw_x = np.concatenate([hx[:1], hx[:0:-1], hx[:1]])
    cw_y = np.concatenate([hy[:1], hy[:0:-1], hy[:1]])
    return cw_x, cw_y


def envelope_ring(lon: np.ndarray, lat: np.ndarray):
    x0, x1 = float(np.min(lon)), float(np.max(lon))
    y0, y1 = float(np.min(lat)), float(np.max(lat))
    return (np.array([x0, x0, x1, x1, x0]), np.array([y0, y1, y1, y0, y0]))


def hull_ring(lon: np.ndarray, lat: np.ndarray):
    ring = _ring_cw_closed(lon, lat)
    return ring if ring is not None else envelope_ring(lon, lat)


def obb_ring(lon: np.ndarray, lat: np.ndarray):
    ring = _ring_cw_closed(lon, lat)
    if ring is None:
        return envelope_ring(lon, lat)
    cx, cy = ring
    a = np.array([cx[0], cy[0]])
    d = np.array([cx[1] - cx[0], cy[1] - cy[0]])
    d = d / np.hypot(*d)
    n = np.array([-d[1], d[0]])
    pts = np.stack([np.asarray(lon, np.float64),
                    np.asarray(lat, np.float64)], 1)
    P = (pts - a) @ np.stack([d, n], 1)
    (umin, vmin), (umax, vmax) = P.min(0), P.max(0)
    corners = np.array([[umax, vmax], [umax, vmin], [umin, vmin],
                        [umin, vmax], [umax, vmax]])
    world = corners @ np.stack([d, n], 1).T + a
    return world[:, 0], world[:, 1]


def _coords(lon, lat) -> str:
    return ",".join(f"{x} {y}" for x, y in zip(fmt7(lon), fmt7(lat)))


def polygon_wkt(lon, lat) -> str:
    return f"POLYGON(({_coords(lon, lat)}))"


def linestring_wkt(lon, lat) -> str:
    return f"LINESTRING({_coords(lon, lat)})"


def way_length_deg(lon: np.ndarray, lat: np.ndarray) -> str:
    """Planar Euclidean path length in degrees, %.6f (way.ttl:
    osm2rdf:length \"0.005285\"). sqrt(dx*dx+dy*dy) — plain IEEE
    ops, bit-identical to the SQL oracle's sqrt expression (np.hypot
    takes a different path and can differ in the last ulp)."""
    dx = np.diff(np.asarray(lon, np.float64))
    dy = np.diff(np.asarray(lat, np.float64))
    return "%.6f" % float(np.sqrt(dx * dx + dy * dy).sum())


def _head_lines(subj: str, osm_type: str, ts_ms, tags) -> list[str]:
    """rdf:type + timestamp + tag + facts lines shared by all kinds.
    `tags` = iterable of (key, value) pairs, emitted in input order
    (osm2rdf's own tag order is an unordered-container artifact; the
    golden comparison is triple-set equality)."""
    lines = [f"{subj} rdf:type osm:{osm_type} ."]
    if ts_ms is not None:
        t = ts_literal_ms(np.array([ts_ms]))[0]
        lines.append(f'{subj} osmmeta:timestamp "{t}"^^xsd:dateTime .')
    tags = list(tags or ())
    if tags:
        vals = turtle_escape([v for _, v in tags])
        lines += [f'{subj} osmkey:{k} "{v}" .'
                  for (k, _), v in zip(tags, vals)]
    lines.append(f'{subj} osm2rdf:facts "{len(tags)}"^^xsd:integer .')
    return lines


def _geom_lines(subj: str, geom_subj: str, wkt: str,
                lon: np.ndarray, lat: np.ndarray) -> list[str]:
    hx, hy = hull_ring(lon, lat)
    ex, ey = envelope_ring(lon, lat)
    ox, oy = obb_ring(lon, lat)
    return [
        f"{subj} geo:hasGeometry {geom_subj} .",
        f'{geom_subj} geo:asWKT "{wkt}"^^geo:wktLiteral .',
        f'{subj} osm2rdfgeom:convex_hull "{polygon_wkt(hx, hy)}"^^geo:wktLiteral .',
        f'{subj} osm2rdfgeom:envelope "{polygon_wkt(ex, ey)}"^^geo:wktLiteral .',
        f'{subj} osm2rdfgeom:obb "{polygon_wkt(ox, oy)}"^^geo:wktLiteral .',
    ]


def node_ttl_block(id: int, lon: float, lat: float, tags, ts_ms) -> str:
    subj = f"osmnode:{id}"
    lon_a, lat_a = np.array([lon]), np.array([lat])
    wkt = f"POINT({fmt7(lon_a)[0]} {fmt7(lat_a)[0]})"
    lines = _head_lines(subj, "node", ts_ms, tags)
    lines += _geom_lines(subj, f"osm2rdfgeom:osm_node_{id}", wkt,
                         lon_a, lat_a)
    return "\n".join(lines)


def way_ttl_block(id: int, lons: np.ndarray, lats: np.ndarray,
                  tags, ts_ms) -> str:
    """`lons`/`lats` = resolved node coordinates in nd_refs order."""
    subj = f"osmway:{id}"
    lines = _head_lines(subj, "way", ts_ms, tags)
    lines += _geom_lines(subj, f"osm2rdf:way_{id}",
                         linestring_wkt(lons, lats), lons, lats)
    lines.append(
        f'{subj} osm2rdf:length "{way_length_deg(lons, lats)}"^^xsd:double .')
    return "\n".join(lines)


def relation_ttl_block(id: int, members, tags, ts_ms,
                       bn_label: str | None = None) -> str:
    """`members` = iterable of (ref, type, role) in position order.
    Blank-node labels are `_:<bn_label>_<pos>`; the default label is
    the relation id (the golden's numeric label is osm2rdf's internal
    element counter — blank-node names are not RDF-significant, and
    the golden test canonicalizes them on both sides)."""
    subj = f"osmrel:{id}"
    lines = _head_lines(subj, "relation", ts_ms, tags)
    label = bn_label if bn_label is not None else str(id)
    for pos, (ref, mtype, role) in enumerate(members or ()):
        bn = f"_:{label}_{pos}"
        lines += [
            f"{subj} osmrel:member {bn} .",
            f"{bn} osm2rdfmember:id {_TYPE_NS[mtype]}:{ref} .",
            f'{bn} osm2rdfmember:role "{role if role else "member"}" .',
            f'{bn} osm2rdfmember:pos "{pos}"^^xsd:integer .',
        ]
    return "\n".join(lines)
