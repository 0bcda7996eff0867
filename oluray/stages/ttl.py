"""TTL triple-stream stages: read, parse, and the relevant-triple
filter — the reference's osm2rdf -> TTL -> SPARQL-update flow
re-expressed as Ray Data stages.

- S8 TTL output reader (`read_ttl`) — line stream, `@prefix` lines
  skipped (`/root/reference/src/osm/OsmChangeHandler.cpp:599-604`),
  gzip/bz2 aware like the reference's Decompressor.
- M10 parse (`parse_triples`) — vectorized regex split.
- ST2 link-following filter (`filter_relevant_triples`) — the
  reference walks the TTL file sequentially carrying a `currentLink`
  cursor (`OsmChangeHandler.cpp:595-656`): a line is kept if (a) its
  subject is an element in one of the to-insert id sets, or (b) its
  subject equals the object of the previous kept element triple
  whose predicate was a link predicate (geometry subjects, member
  blank nodes). (b) is ordering-sensitive; the ORDER-FREE equivalent
  used here is set semantics: keep every non-element-subject line
  whose subject appears in the set of link objects of kept element
  triples. On real osm2rdf output (each linked block directly
  follows its element, link subjects are osm2rdfgeom:/blank-node
  subjects) the two produce identical triple sets; order-freedom is
  what lets the filter run as a distributed semi-join instead of a
  single sequential scan.

Scale: the TTL stream is DIFF-sized in the reference flow (osm2rdf
runs on the extracted change subset, not the planet), so pinning the
classified triples for the two downstream consumers is bounded by
the change window. Id sets route through `closure.KeySet`'s
size-probed broadcast-vs-shuffle dispatch; link-subject keys follow
the same probe (broadcast when every id set was broadcast-sized,
hash-partitioned `joins.semi_join` otherwise).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from oluray.functions import ttl as ttlf
from oluray.functions.xmlcodec import xml_decode_series
from oluray.sources.osc import decompress
from oluray.stages import closure, joins

TRIPLE_SCHEMA = pa.schema([("s", pa.string()), ("p", pa.string()), ("o", pa.string())])
_CLASSIFIED_SCHEMA = pa.schema(
    list(TRIPLE_SCHEMA)
    + [pa.field("elem_type", pa.string()), pa.field("elem_id", pa.int64())]
)


def read_ttl(paths, parallelism: int = -1) -> ray.data.Dataset:
    """S8: TTL file(s) -> Dataset of `line` (directive lines starting
    with `@` and blank lines dropped). Plain files go through
    `read_text` (byte-range line splits — many blocks per file);
    .gz/.bz2 files decompress whole-file per task like the
    reference's Decompressor (gzip members aren't splittable without
    an index anyway)."""
    if isinstance(paths, (str,)):
        paths = [paths]
    compressed = [p for p in paths if str(p).endswith((".gz", ".bz2"))]
    plain = [p for p in paths if not str(p).endswith((".gz", ".bz2"))]
    parts = []
    if plain:
        ds = ray.data.read_text(plain, override_num_blocks=None if parallelism == -1 else parallelism)

        def ren(t: pa.Table) -> pa.Table:
            return t.rename_columns(["line"])

        parts.append(ds.map_batches(ren, batch_format="pyarrow"))
    if compressed:
        raw = ray.data.read_binary_files(compressed)

        def unpack(t: pa.Table) -> pa.Table:
            out = []
            for buf in t["bytes"]:
                text = decompress(buf.as_py()).decode("utf-8")
                out.extend(ln for ln in text.splitlines() if ln)
            return pa.table({"line": pa.array(out, pa.string())})

        parts.append(raw.map_batches(unpack, batch_format="pyarrow"))
    out = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])

    def drop_directives(t: pa.Table) -> pa.Table:
        keep = pc.invert(pc.starts_with(t["line"], "@"))
        ne = pc.greater(pc.utf8_length(t["line"]), 0)
        return t.filter(pc.and_(keep, ne))

    return out.map_batches(drop_directives, batch_format="pyarrow")


def parse_triples(lines: ray.data.Dataset) -> ray.data.Dataset:
    """M10: `line` Dataset -> (s, p, o) Dataset."""

    def fn(t: pa.Table) -> pa.Table:
        return ttlf.split_triples(t["line"])

    return lines.map_batches(fn, batch_format="pyarrow")


def _classify(t: pa.Table) -> pa.Table:
    """Add (elem_type, elem_id): which element namespace owns the
    subject, '' / null for link-block subjects (geometry, blank
    nodes, unrelated namespaces)."""
    s = t["s"].combine_chunks() if isinstance(t["s"], pa.ChunkedArray) else t["s"]
    n = len(t)
    etype = np.full(n, "", dtype=object)
    eid = np.zeros(n, dtype=np.int64)
    claimed = np.zeros(n, dtype=bool)
    for ot in ttlf.ELEMENT_TYPES:
        mask = ttlf.relevant_namespace_mask(s, ot).to_numpy(zero_copy_only=False)
        mask &= ~claimed
        if not mask.any():
            continue
        sub = s.filter(pa.array(mask))
        ids = ttlf.id_from_subject(sub, ot, strict=True)
        etype[mask] = ot
        eid[mask] = ids.to_numpy(zero_copy_only=False)
        claimed |= mask
    return t.append_column("elem_type", pa.array(etype, pa.string())).append_column(
        "elem_id", pa.array(eid, pa.int64())
    )


def filter_relevant_triples(
    triples: ray.data.Dataset,
    node_ids,
    way_ids,
    rel_ids,
    num_partitions: int = 32,
    broadcast_limit: int | None = None,
) -> ray.data.Dataset:
    """ST2, order-free: keep element triples whose id is in the
    per-type insert set, plus link-block lines whose subject is a
    link object of a kept element triple; decode `osmkey:` literal
    objects (`OsmChangeHandler.cpp:609-612`). Returns (s, p, o)."""
    limit_kw = {} if broadcast_limit is None else {"limit": broadcast_limit}
    sets = {
        "node": closure.wrap_keys(node_ids, **limit_kw),
        "way": closure.wrap_keys(way_ids, **limit_kw),
        "relation": closure.wrap_keys(rel_ids, **limit_kw),
    }
    all_broadcast = all(ks.is_broadcast for ks in sets.values())

    classified = triples.map_batches(_classify, batch_format="pyarrow")
    # two consumers below (element pass + link pass): pin the parsed
    # lineage once — diff-sized by the osm2rdf contract (module doc)
    classified = classified.materialize()

    def _typed(val: str, eq: bool):
        def fn(t: pa.Table) -> pa.Table:
            m = pc.equal(t["elem_type"], val)
            return t.filter(m if eq else pc.invert(m))

        return fn

    elements = classified.map_batches(_typed("", False), batch_format="pyarrow")
    if all_broadcast:
        refs = {t: ks.ref() for t, ks in sets.items()}

        def keep_elems(t: pa.Table) -> pa.Table:
            mask = np.zeros(len(t), dtype=bool)
            et = t["elem_type"].to_numpy(zero_copy_only=False)
            eid = t["elem_id"].to_numpy(zero_copy_only=False)
            for ot, ref in refs.items():
                sel = et == ot
                if sel.any():
                    mask[sel] = np.isin(eid[sel], ray.get(ref))
            return t.filter(pa.array(mask))

        kept_elems = elements.map_batches(keep_elems, batch_format="pyarrow")
    else:
        parts = [
            closure.semi_join(
                elements.map_batches(_typed(ot, True), batch_format="pyarrow"),
                "elem_id",
                sets[ot],
                schema=_CLASSIFIED_SCHEMA,
                num_partitions=num_partitions,
            )
            for ot in ttlf.ELEMENT_TYPES
        ]
        kept_elems = parts[0].union(*parts[1:])
    kept_elems = kept_elems.materialize()  # consumed twice (output + link keys)

    def link_objects(t: pa.Table) -> pa.Table:
        mask = np.zeros(len(t), dtype=bool)
        et = t["elem_type"].to_numpy(zero_copy_only=False)
        for ot in ttlf.ELEMENT_TYPES:
            sel = et == ot
            if sel.any():
                lm = ttlf.link_predicate_mask(t["p"], ot).to_numpy(zero_copy_only=False)
                mask |= sel & lm
        kt = t.filter(pa.array(mask))
        return pa.table({"link_s": pc.unique(kt["o"].combine_chunks())})

    link_keys = kept_elems.map_batches(link_objects, batch_format="pyarrow")
    nonelem = classified.map_batches(
        _typed("", True), batch_format="pyarrow"
    ).select_columns(["s", "p", "o"])

    if all_broadcast:
        # diff-sized window: link-subject set is broadcast like the
        # id sets (strings, so not a closure.KeySet — same shape)
        keys = np.unique(
            np.concatenate(
                [b["link_s"].to_numpy(zero_copy_only=False) for b in
                 link_keys.iter_batches(batch_format="pyarrow")]
                or [np.array([], dtype=object)]
            )
        )
        keys_ref = ray.put(keys)

        def keep_links(t: pa.Table) -> pa.Table:
            kv = ray.get(keys_ref)
            mask = np.isin(t["s"].to_numpy(zero_copy_only=False), kv)
            return t.filter(pa.array(mask))

        kept_links = nonelem.map_batches(keep_links, batch_format="pyarrow")
    else:
        kept_links = joins.semi_join(
            nonelem,
            link_keys,
            on="s",
            key_col="link_s",
            num_partitions=num_partitions,
            left_schema=TRIPLE_SCHEMA,
            keys_schema=pa.schema([("link_s", pa.string())]),
        )

    out = kept_elems.select_columns(["s", "p", "o"]).union(kept_links)

    def decode(df: pd.DataFrame) -> pd.DataFrame:
        mask = df["p"].str.startswith("osmkey:")
        if mask.any():
            df = df.copy(deep=False)
            df.loc[mask, "o"] = xml_decode_series(df.loc[mask, "o"])
        return df

    return out.map_batches(decode, batch_format="pandas")
