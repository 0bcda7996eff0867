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
