"""OsmChange (.osc) ingestion: the reference's real input format.

Reimplements (NOT ports) the reference's change-file plumbing as Ray
Data sources/stages:

- `parse_osc` — gzip/bz2-aware OsmChange XML -> `changes`-table rows
  (`/root/reference/src/osm/OsmChangeHandler.cpp:62-64,153-197` uses a
  boost ptree; here: one `xml.etree` pass per file inside
  `map_batches` over `read_binary_files` batches — files are the unit
  of parallelism, like replication diffs).
- `decompress` — whole-buffer gzip/bz2 (`src/util/Decompressor.cpp:34-68`).
- `write_osc` — `changes` rows -> canonical OsmChange XML (the
  temp-file writers, `src/osm/OsmChangeHandler.cpp:119-151`).
- sequence-number path formatting `NNN/NNN/NNN` + state.txt parsing
  (`src/util/URLHelper.cpp:57-72`, `src/osm/OsmDataFetcher.cpp:46-79`)
  incl. the boundary errors the reference tests
  (`tests/util/URLHelper.cpp:30-61`).
- `sequence_for_timestamp` — the reference's walk-backward cursor
  recovery (`src/osm/OsmDataFetcher.cpp:163-175`) as a binary search
  over local state manifests.
"""

from __future__ import annotations

import bz2
import gzip
import re
import xml.etree.ElementTree as ET

import pyarrow as pa

from oluray.sources.fixtures import CHANGES_SCHEMA

_OPS = ("create", "modify", "delete")


def decompress(data: bytes) -> bytes:
    """gzip / bz2 / plain passthrough by magic bytes."""
    if data[:2] == b"\x1f\x8b":
        return gzip.decompress(data)
    if data[:3] == b"BZh":
        return bz2.decompress(data)
    return data


def _parse_ts_ms(ts: str | None):
    if not ts:
        return None
    import datetime

    return int(
        datetime.datetime.strptime(ts, "%Y-%m-%dT%H:%M:%SZ")
        .replace(tzinfo=datetime.timezone.utc)
        .timestamp()
        * 1000
    )


def _element_row(el, op: str, kind: str) -> dict:
    tags = [(t.get("k"), t.get("v")) for t in el.findall("tag")]
    payload = {
        "lon": float(el.get("lon")) if el.get("lon") else None,
        "lat": float(el.get("lat")) if el.get("lat") else None,
        "nd_refs": [int(nd.get("ref")) for nd in el.findall("nd")] or None,
        "members": [
            {
                "ref": int(m.get("ref")),
                "type": m.get("type"),
                "role": m.get("role", ""),
            }
            for m in el.findall("member")
        ]
        or None,
        "tags": tags or None,
    }
    return {
        "op": op,
        "kind": kind,
        "id": int(el.get("id")),
        "version": int(el.get("version", "1")),
        "ts": _parse_ts_ms(el.get("timestamp")),
        "payload": payload,
    }


def parse_osc_bytes(data: bytes) -> list[dict]:
    """One OsmChange document -> list of `changes` rows."""
    root = ET.fromstring(decompress(data).decode("utf-8"))
    rows: list[dict] = []
    for changeset in root:
        op = changeset.tag
        if op not in _OPS:
            continue
        for el in changeset:
            kind = el.tag
            if kind not in ("node", "way", "relation"):
                continue
            rows.append(_element_row(el, op, kind))
    return rows


def parse_osm_bytes(data: bytes) -> list[dict]:
    """One OSM snapshot document (`<osm>` root, elements at top
    level — the shape the reference feeds to its converter, e.g.
    `/root/reference/tests/data/node.osm`) -> `changes` rows with
    op='create' (a snapshot is the create-everything diff)."""
    root = ET.fromstring(decompress(data).decode("utf-8"))
    return [
        _element_row(el, "create", el.tag)
        for el in root
        if el.tag in ("node", "way", "relation")
    ]


def parse_osc_batch(batch: pa.Table) -> pa.Table:
    """map_batches UDF over `ray.data.read_binary_files` output
    (columns: bytes, [path]) -> changes rows."""
    rows: list[dict] = []
    for data in batch["bytes"].to_pylist():
        rows.extend(parse_osc_bytes(data))
    return pa.Table.from_pylist(rows, schema=CHANGES_SCHEMA)


def read_osc(paths, parallelism: int = -1):
    """Directory/list of .osc[.gz|.bz2] -> changes Dataset. Ordering
    contract (oldest->newest by filename, `README.md:22-26`) is
    irrelevant after latest-wins merge — the merge is order-free.
    `parallelism` (-1 = let Ray decide) controls the read fan-out."""
    import ray.data

    kw = {} if parallelism == -1 else {"override_num_blocks": parallelism}
    files = ray.data.read_binary_files(paths, **kw)
    return files.map_batches(parse_osc_batch, batch_format="pyarrow", batch_size=4)


def write_osc(rows: list[dict]) -> str:
    """changes rows -> canonical OsmChange XML document (op-grouped,
    like the reference's merged tmp/changes.osc)."""
    from oluray.functions.xmlcodec import node_xml, relation_xml, way_xml

    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<osmChange version="0.6" generator="oluray">']
    for op in _OPS:
        sel = [r for r in rows if r["op"] == op]
        if not sel:
            continue
        parts.append(f"<{op}>")
        for r in sel:
            p = r.get("payload") or {}
            tags = p.get("tags")
            if r["kind"] == "node":
                parts.append(node_xml(r["id"], p.get("lon"), p.get("lat"), tags,
                                      r.get("ts"), r.get("version")))
            elif r["kind"] == "way":
                parts.append(way_xml(r["id"], p.get("nd_refs") or [], tags, r.get("ts"),
                                     r.get("version")))
            else:
                parts.append(relation_xml(r["id"], p.get("members") or [], tags,
                                          r.get("ts"), r.get("version")))
        parts.append(f"</{op}>")
    parts.append("</osmChange>")
    return "\n".join(parts)


# ---------------------------------------------------------------------------
# replication cursor helpers
# ---------------------------------------------------------------------------


def seq_path(seq: int) -> str:
    """sequence number -> zero-padded NNN/NNN/NNN
    (`src/util/URLHelper.cpp:57-72`); the reference errors on numbers
    wider than 9 digits and on negatives."""
    if seq < 0:
        raise ValueError("sequence number must be non-negative")
    s = f"{seq:09d}"
    if len(s) > 9:
        raise ValueError("sequence number too large (max 9 digits)")
    return f"{s[0:3]}/{s[3:6]}/{s[6:9]}"


_STATE_SEQ = re.compile(r"sequenceNumber=(\d+)")
_STATE_TS = re.compile(r"timestamp=([0-9TZ:\\-]+)")


def parse_state(text: str) -> dict:
    """state.txt -> {sequence, timestamp}
    (`src/osm/OsmDataFetcher.cpp:46-79`); timestamps carry escaped
    colons (`\\:`) in the wild."""
    m = _STATE_SEQ.search(text)
    if not m:
        raise ValueError("state file missing sequenceNumber")
    t = _STATE_TS.search(text.replace("\\:", ":"))
    return {
        "sequence": int(m.group(1)),
        "timestamp": t.group(1) if t else None,
    }


def sequence_for_timestamp(states: list[dict], target_ts: str) -> int:
    """Largest sequence whose timestamp <= target (the reference walks
    backward over HTTP, `src/osm/OsmDataFetcher.cpp:163-175`; local
    manifests allow binary search). `states` sorted by sequence.
    States whose timestamp could not be parsed (parse_state returns
    timestamp=None for a malformed state.txt) are skipped — one bad
    manifest must not break cursor recovery."""
    states = [s for s in states if s.get("timestamp") is not None]
    lo, hi, best = 0, len(states) - 1, None
    while lo <= hi:
        mid = (lo + hi) // 2
        if states[mid]["timestamp"] <= target_ts:
            best = states[mid]["sequence"]
            lo = mid + 1
        else:
            hi = mid - 1
    if best is None:
        raise ValueError("no state at or before target timestamp")
    return best
