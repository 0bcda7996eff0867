"""osm2rdf-parity TTL emission vs the reference goldens.

The reference converts extracted .osm element subsets to TTL via its
vendored osm2rdf (`/root/reference/src/osm/Osm2ttl.cpp:38-133`);
the byte contract is the goldens `tests/data/{node,way,relation}.ttl`
paired with their inputs `node.osm` / `wayWithReferences.osm` /
`relation.osm`. Comparison here is TRIPLE-SET equality modulo
blank-node labels:

- triple ORDER in a Turtle file is a serialization artifact (osm2rdf
  interleaves elements from its parallel workers, and emits tags in
  unordered-container order);
- blank-node LABELS are not RDF-significant (the golden's `_:6_0`
  numeral is osm2rdf's internal element counter); both sides are
  canonicalized to `_:<parent-subject>#<pos>` via their
  osm2rdfmember:pos triples before comparing.

Everything else — every subject/predicate/object byte, including the
full WKT literals (7-dp POINT/LINESTRING/hull/envelope/obb rings and
the %.6f length) and the @prefix header — must match exactly.
"""

from __future__ import annotations

import os
import re

import pytest
import ray.data

REF = "/root/reference/tests/data"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not present"
)


def _tables_from_osm(path: str):
    import pyarrow as pa

    from oluray.pipelines.update import (
        _payload_nodes, _payload_relations, _payload_ways,
    )
    from oluray.sources import osc
    from oluray.sources.fixtures import CHANGES_SCHEMA

    with open(path, "rb") as f:
        rows = osc.parse_osm_bytes(f.read())
    merged = ray.data.from_arrow(pa.Table.from_pylist(rows, CHANGES_SCHEMA))
    return (_payload_nodes(merged), _payload_ways(merged),
            _payload_relations(merged))


_BLANK = re.compile(r"^_:\S+$")


def canon_triples(text: str) -> set[str]:
    """Turtle lines -> canonical triple set (header dropped, blank
    labels rewritten to _:<parent>#<pos>)."""
    triples = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("@prefix"):
            continue
        m = re.match(r"(\S+)\s(\S+)\s(.*)\s\.$", line)
        assert m, f"unparseable TTL line: {line!r}"
        triples.append(m.groups())
    # blank label -> (parent subject, pos)
    parent: dict[str, str] = {}
    pos: dict[str, str] = {}
    for s, p, o in triples:
        if p == "osmrel:member" and _BLANK.match(o):
            parent[o] = s
        if p == "osm2rdfmember:pos" and _BLANK.match(s):
            pos[s] = o.split('"')[1]

    def rename(tok: str) -> str:
        if _BLANK.match(tok) and tok in pos:
            return f"_:{parent.get(tok, '?')}#{pos[tok]}"
        return tok

    return {f"{rename(s)} {p} {rename(o)}" for s, p, o in triples}


def _golden(name: str) -> set[str]:
    with open(os.path.join(REF, name), encoding="utf-8") as f:
        return canon_triples(f.read())


def _emitted(tmp_path, **kw) -> set[str]:
    from oluray.stages import ttl as T

    out = str(tmp_path / "out.ttl")
    T.write_ttl(T.emit_ttl(**kw), out)
    with open(out, encoding="utf-8") as f:
        text = f.read()
    # header parity: the exact 20-line @prefix block, same order
    from oluray.functions.ttl import TTL_PREFIXES

    assert text.splitlines()[: len(TTL_PREFIXES)] == TTL_PREFIXES
    return canon_triples(text)


def test_node_golden(ray_session, tmp_path):
    nodes, _, _ = _tables_from_osm(f"{REF}/node.osm")
    got = _emitted(tmp_path, nodes=nodes)
    exp = _golden("node.ttl")
    assert got == exp


def test_way_golden(ray_session, tmp_path):
    nodes, ways, _ = _tables_from_osm(f"{REF}/wayWithReferences.osm")
    got = _emitted(tmp_path, nodes=nodes, ways=ways)
    exp = _golden("way.ttl")
    assert got == exp


def test_relation_golden(ray_session, tmp_path):
    _, _, rels = _tables_from_osm(f"{REF}/relation.osm")
    got = _emitted(tmp_path, relations=rels)
    exp = _golden("relation.ttl")
    assert got == exp


def test_way_missing_refs(ray_session, tmp_path):
    """missing='error' raises on an unresolvable ref; 'skip' drops
    the way (J7 missing-ok analog for the emission path)."""
    import pyarrow as pa

    from oluray.sources.fixtures import NODES_SCHEMA, WAYS_SCHEMA
    from oluray.stages import ttl as T

    nodes = ray.data.from_arrow(pa.table(
        {"id": pa.array([1, 2], pa.int64()),
         "lon": pa.array([1.0, 2.0]), "lat": pa.array([3.0, 4.0]),
         "tags": pa.nulls(2, NODES_SCHEMA.field("tags").type),
         "version": pa.array([1, 1], pa.int64()),
         "ts": pa.nulls(2, pa.timestamp("ms"))}, schema=NODES_SCHEMA))
    ways = ray.data.from_arrow(pa.table(
        {"id": pa.array([10, 11], pa.int64()),
         "nd_refs": pa.array([[1, 2], [1, 99]], pa.list_(pa.int64())),
         "tags": pa.nulls(2, WAYS_SCHEMA.field("tags").type),
         "version": pa.array([1, 1], pa.int64()),
         "ts": pa.nulls(2, pa.timestamp("ms"))}, schema=WAYS_SCHEMA))

    kept = T.emit_way_ttl(ways, nodes, missing="skip").to_pandas()
    assert list(kept["id"]) == [10]
    with pytest.raises(Exception, match="resolvable"):
        T.emit_way_ttl(ways, nodes, missing="error").to_pandas()


def test_shard_sink_roundtrip(ray_session, tmp_path):
    """write_ttl_shards: cat(_prefixes, parts) == write_ttl output as
    a triple set."""
    nodes, _, _ = _tables_from_osm(f"{REF}/node.osm")
    from oluray.stages import ttl as T

    d = str(tmp_path / "shards")
    n = T.write_ttl_shards(T.emit_ttl(nodes=nodes), d)
    assert n == 1
    text = open(os.path.join(d, "_prefixes.ttl")).read()
    for p in sorted(os.listdir(d)):
        if p.startswith("part-"):
            text += open(os.path.join(d, p)).read()
    assert canon_triples(text) == _golden("node.ttl")


def test_emit_parse_roundtrip_property(ray_session):
    """Property link between the write and read paths: every line a
    block emitter produces must (a) parse under the reference's
    triple regex (M10) and (b) resolve its element subject back to
    the original id (M11) — including tag values that need Turtle
    escaping (quotes, backslashes, newlines), which the goldens never
    exercise."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from oluray.functions import ttl as F

    tag_val = st.text(min_size=0, max_size=40).filter(
        lambda s: "\x00" not in s
    )

    @settings(max_examples=60, deadline=None)
    @given(
        id=st.integers(min_value=1, max_value=2**53),
        lon=st.floats(min_value=-180, max_value=180, allow_nan=False),
        lat=st.floats(min_value=-85, max_value=85, allow_nan=False),
        vals=st.lists(tag_val, max_size=3),
    )
    def check(id, lon, lat, vals):
        tags = [(f"k{i}", v) for i, v in enumerate(vals)]
        block = F.node_ttl_block(id, lon, lat, tags, 1_700_000_000_000)
        lines = block.splitlines()
        # facts line counts the tags
        assert f'osm2rdf:facts "{len(tags)}"^^xsd:integer' in block
        for ln in lines:
            m = re.match(F.TRIPLE_PATTERN + r"$", ln)
            assert m, ln
            # escaped literals stay single-line: regex groups rejoin
            s = m.group("s")
            if s.startswith("osmnode:"):
                got = F.id_from_subject(
                    __import__("pyarrow").array([s]), "node"
                )[0].as_py()
                assert got == id

    check()
