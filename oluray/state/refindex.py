"""Persistent reverse-reference index: diff-proportional impact
closure for the continuous window loop.

The reference's impact closure is an INDEXED lookup — its snapshot
lives in a SPARQL store, so "which ways reference these nodes"
(`/root/reference/src/sparql/QueryWriter.cpp:169-184`) and "which
relations reference these nodes/ways" (`:187-220`) are answered by
the triple store's subject/object indexes, never by a scan. The r1-r3
Ray loop answered them by exploding the FULL ways/relations snapshot
every window (`closure.ways_to_update_geometry` et al.) — correct and
streaming, but a minutely diff of ~10^4 elements re-scanned ~10^12
member rows per window at the 100 TB design point.

`RefIndex` is that reverse index made durable in the engine's own
storage shape: one on-disk table of `(key, ktype, owner, otype)`
rows — `key` a referenced element id, `owner` the way/relation whose
member list contains it — hash-bucketed by `key` with the same
splitmix64 partitioner and the same atomic two-rename bucket swap the
`SnapshotStore` uses. A window's closure then reads ONLY the buckets
its changed ids hash to (`owners_of`), and maintenance rewrites ONLY
the buckets holding the changed owners' old/new member keys
(`apply_window`) — both diff-proportional.

Crash contract (mirrors `SnapshotStore.apply_window`): mutations for
a window are STAGED (parquet + `_done` marker) by the caller BEFORE
the snapshot store mutates, because computing "the old member keys of
the changed owners" requires the pre-update snapshot; `apply_window`
is manifest-gated and replays from the staging on re-entry, so any
crash ordering converges — bucket rewrites are delete+insert
fixpoints exactly like the store's.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import shutil
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from oluray.state.snapshot import (
    _bucket_dir,
    _bucket_of,
    _read_bucket,
    _recover_bucket,
    _write_bucket_atomic,
)

_IDX_MANIFEST = "_refindex.json"

SCHEMA = pa.schema(
    [
        ("key", pa.int64()),     # referenced element id
        ("ktype", pa.string()),  # node | way | relation (member type)
        ("owner", pa.int64()),   # referencing element id
        ("otype", pa.string()),  # way | relation (owner kind)
    ]
)


def explode_ways_entries(ways: ray.data.Dataset) -> ray.data.Dataset:
    """ways(id, nd_refs) -> index entries (node ref -> owning way)."""

    def fn(t: pa.Table) -> pa.Table:
        refs = t["nd_refs"].combine_chunks()
        flat = pc.list_flatten(refs)
        parents = pc.list_parent_indices(refs)
        owners = pc.take(t["id"], parents)
        n = len(flat)
        return pa.table(
            {
                "key": flat.cast(pa.int64()),
                "ktype": pa.array(np.full(n, "node", object), pa.string()),
                "owner": owners.cast(pa.int64()),
                "otype": pa.array(np.full(n, "way", object), pa.string()),
            },
            schema=SCHEMA,
        )

    return ways.select_columns(["id", "nd_refs"]).map_batches(
        fn, batch_format="pyarrow"
    )


def explode_relations_entries(relations: ray.data.Dataset) -> ray.data.Dataset:
    """relations(id, members) -> entries (member ref -> owning rel)."""

    def fn(t: pa.Table) -> pa.Table:
        mem = t["members"].combine_chunks()
        flat = pc.list_flatten(mem)
        parents = pc.list_parent_indices(mem)
        owners = pc.take(t["id"], parents)
        n = len(flat)
        return pa.table(
            {
                "key": flat.field("ref").cast(pa.int64()),
                "ktype": flat.field("type").cast(pa.string()),
                "owner": owners.cast(pa.int64()),
                "otype": pa.array(np.full(n, "relation", object), pa.string()),
            },
            schema=SCHEMA,
        )

    return relations.select_columns(["id", "members"]).map_batches(
        fn, batch_format="pyarrow"
    )


class RefIndex:
    """On-disk reverse-member index, hash-bucketed by `key`.

    Layout under `root/`:
      `_refindex.json` — {n_buckets}
      `bucket=<b>/*.parquet` — live entries
      `_windows/<wid>.json` — per-window apply manifest (touched
        buckets, delete/insert counts)
      `_stage/<wid>/` — staged mutations (written by the caller before
        the snapshot store mutates; replayed on crash re-entry)
    """

    def __init__(self, root: str):
        self.root = root
        with open(os.path.join(root, _IDX_MANIFEST)) as f:
            self.n_buckets = int(json.load(f)["n_buckets"])

    # -- construction --------------------------------------------------

    @classmethod
    def create(
        cls, root: str, ways: ray.data.Dataset,
        relations: ray.data.Dataset, n_buckets: int = 64,
    ) -> "RefIndex":
        """One-time index build (the DB's CREATE INDEX): one
        distributed explode+write pass over ways and relations.

        Files are written by a KEYED partition write — each bucket
        lands in exactly ONE file regardless of how many input blocks
        the sources arrive in. (The r4 hive write produced one file
        per block x bucket: an index auto-built from a 192-block
        `store.read` carried ~20 files/bucket, and every per-window
        `owners_of` paid ~20 file opens per touched bucket — measured
        30 s vs 18 s on the 4-window backfill bench.)"""
        from oluray.stages import joins

        os.makedirs(root, exist_ok=True)
        entries = explode_ways_entries(ways).union(
            explode_relations_entries(relations)
        )
        nb = n_buckets

        def tag(t: pa.Table, _nb=nb) -> pa.Table:
            keys = t["key"].to_numpy(zero_copy_only=False)
            return t.append_column("__b", pa.array(_bucket_of(keys, _nb)))

        def write_part(df: "pd.DataFrame") -> "pd.DataFrame":
            import pandas as _pd

            out_b, out_rows = [], []
            for b, g in df.groupby("__b", sort=False):
                d = _bucket_dir(root, int(b))
                os.makedirs(d, exist_ok=True)
                t = pa.Table.from_pandas(
                    g.drop(columns="__b"), preserve_index=False
                ).select(SCHEMA.names).cast(SCHEMA)
                pq.write_table(t, os.path.join(d, "part-0.parquet"))
                out_b.append(int(b))
                out_rows.append(len(g))
            return _pd.DataFrame({"b": out_b, "rows": out_rows})

        joins.partitioned_map(
            entries.map_batches(tag, batch_format="pyarrow"), ["__b"],
            write_part, num_partitions=min(n_buckets, 32),
        ).count()  # consume: the writes ARE the output
        os.makedirs(os.path.join(root, "_windows"), exist_ok=True)
        with open(os.path.join(root, _IDX_MANIFEST), "w") as f:
            json.dump({"n_buckets": n_buckets}, f)
        return cls(root)

    # -- reads ----------------------------------------------------------

    def _recover_all(self) -> None:
        for d in _glob.glob(os.path.join(self.root, "bucket=*.old")) + \
                _glob.glob(os.path.join(self.root, "bucket=*.apply-tmp")):
            base = os.path.basename(d)
            b = int(base.split("=", 1)[1].split(".", 1)[0])
            _recover_bucket(self.root, b)

    def read(self) -> ray.data.Dataset:
        """Full streaming read (tests / fallback path)."""
        self._recover_all()
        files = sorted(
            f
            for d in _glob.glob(os.path.join(self.root, "bucket=*"))
            if not d.endswith((".old", ".apply-tmp"))
            for f in _glob.glob(os.path.join(d, "*.parquet"))
        )
        if not files:
            return ray.data.from_arrow(SCHEMA.empty_table())
        return ray.data.read_parquet(files)

    def owners_of(self, keys, ktypes: tuple[str, ...],
                  otype: str, exclude=None,
                  limit: int | None = None) -> "object":
        """Distinct owner ids (as a size-probed `closure.KeySet`) of
        entries with `key in keys`, `ktype in ktypes`, the given
        `otype`, minus `exclude` — i.e. the J1/J2/J3 reverse queries
        answered from the index. Broadcast key sets read only the
        buckets the keys hash to; dataset-backed sets (backfill) fall
        back to a full index scan + distributed semi-join."""
        from oluray.stages.closure import (
            DEFAULT_BROADCAST_KEY_LIMIT, KeySet, anti_join, broadcast_keys,
            distinct_keys, semi_join, wrap_keys,
        )

        lim = limit if limit is not None else DEFAULT_BROADCAST_KEY_LIMIT
        ks = keys if isinstance(keys, KeySet) else wrap_keys(keys, lim)
        tset = pa.array(list(ktypes), pa.string())

        if ks.is_broadcast:
            from oluray.state.snapshot import LOCAL_READ_BYTES

            ids = ks.to_array()
            if len(ids) == 0:
                return KeySet.from_array(np.array([], np.int64), lim)
            self._recover_all()
            bl = np.unique(_bucket_of(ids, self.n_buckets))
            files = sorted(
                f for b in bl
                for f in _glob.glob(
                    os.path.join(_bucket_dir(self.root, int(b)),
                                 "*.parquet"))
            )
            if not files:
                return KeySet.from_array(np.array([], np.int64), lim)
            if sum(os.path.getsize(f) for f in files) <= LOCAL_READ_BYTES:
                # diff-proportional fast path: one driver scan of the
                # pruned buckets, zero Ray jobs (the reference's
                # indexed SPARQL lookup costs one round-trip too)
                t = pa.concat_tables(
                    [pq.read_table(f).cast(SCHEMA) for f in files]
                )
                m = pc.and_(
                    pc.is_in(t["key"], value_set=pa.array(ids, pa.int64())),
                    pc.and_(pc.is_in(t["ktype"], value_set=tset),
                            pc.equal(t["otype"], otype)),
                )
                owners = np.unique(
                    t.filter(m)["owner"].to_numpy(zero_copy_only=False)
                ).astype(np.int64)
                if exclude is not None:
                    ex = (exclude if isinstance(exclude, KeySet)
                          else wrap_keys(exclude, lim))
                    if ex.is_broadcast:
                        owners = owners[~np.isin(owners, ex.to_array())]
                        return KeySet.from_array(owners, lim)
                    # dataset-backed exclusion: fall through to the
                    # distributed anti-join below with the owner hits
                    hits = ray.data.from_arrow(
                        pa.table({"owner": pa.array(owners, pa.int64())})
                    )
                    hits = anti_join(
                        hits, "owner", ex,
                        schema=pa.schema([("owner", pa.int64())]),
                    )
                    return distinct_keys(hits, "owner", limit=lim)
                return KeySet.from_array(owners, lim)
            ds = ray.data.read_parquet(files)
            ref = broadcast_keys(ids)

            def match(t: pa.Table) -> pa.Table:
                kv = ray.get(ref)
                m = pc.and_(
                    pc.is_in(t["key"], value_set=pa.array(kv, pa.int64())),
                    pc.and_(pc.is_in(t["ktype"], value_set=tset),
                            pc.equal(t["otype"], otype)),
                )
                return t.filter(m).select(["owner"])

            hits = ds.map_batches(match, batch_format="pyarrow")
        else:

            def tmatch(t: pa.Table) -> pa.Table:
                m = pc.and_(pc.is_in(t["ktype"], value_set=tset),
                            pc.equal(t["otype"], otype))
                return t.filter(m)

            hits = semi_join(
                self.read().map_batches(tmatch, batch_format="pyarrow"),
                "key", ks, schema=SCHEMA,
            ).select_columns(["owner"])
        if exclude is not None:
            hits = anti_join(
                hits, "owner",
                exclude if isinstance(exclude, KeySet) else wrap_keys(exclude, lim),
                schema=pa.schema([("owner", pa.int64())]),
            )
        return distinct_keys(hits, "owner", limit=lim)

    # -- window maintenance ----------------------------------------------

    def window_manifest(self, window_id: str) -> dict | None:
        p = os.path.join(self.root, "_windows", f"{window_id}.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def stage_dir(self, window_id: str) -> str:
        return os.path.join(self.root, "_stage", window_id)

    def stage_window(
        self, window_id: str,
        changed_owners: dict[str, np.ndarray],
        old_entries: ray.data.Dataset,
        new_entries: ray.data.Dataset,
    ) -> str:
        """Persist a window's index mutations BEFORE the snapshot
        store mutates (the old entries are only derivable from the
        pre-update snapshot). `changed_owners` maps otype -> owner id
        array (create+modify+delete); `old_entries`/`new_entries` are
        SCHEMA-shaped Datasets (old = exploded pre-update rows of the
        changed owners; new = exploded payload rows). Staging is
        atomic via a `_done` marker; re-staging overwrites."""
        sd = self.stage_dir(window_id)
        if os.path.exists(sd):
            shutil.rmtree(sd)
        os.makedirs(sd)
        old_entries.write_parquet(os.path.join(sd, "old"))
        new_entries.write_parquet(os.path.join(sd, "new"))
        with open(os.path.join(sd, "owners.json"), "w") as f:
            json.dump({k: np.asarray(v, dtype=np.int64).tolist()
                       for k, v in changed_owners.items()}, f)
        with open(os.path.join(sd, "_done"), "w") as f:
            f.write("1")
        return sd

    def apply_window(self, window_id: str) -> dict:
        """Apply the staged mutations: per touched bucket, drop every
        entry whose owner changed this window, insert the new entries.
        Manifest-gated and idempotent (bucket delete+insert fixpoint,
        atomic two-rename swap). Touched buckets = buckets of the OLD
        keys union buckets of the NEW keys — diff-proportional."""
        done = self.window_manifest(window_id)
        if done is not None:
            return done
        sd = self.stage_dir(window_id)
        if not os.path.exists(os.path.join(sd, "_done")):
            raise FileNotFoundError(
                f"refindex staging for {window_id} missing/incomplete — "
                "stage_window must run before the snapshot store mutates"
            )
        t0 = time.perf_counter()

        def _read_stage(sub: str) -> pa.Table:
            files = sorted(
                _glob.glob(os.path.join(sd, sub, "*.parquet")))
            if not files:
                return SCHEMA.empty_table()
            return pa.concat_tables(
                [pq.read_table(f).cast(SCHEMA) for f in files])

        old = _read_stage("old")
        new = _read_stage("new")
        with open(os.path.join(sd, "owners.json")) as f:
            owners = {k: np.asarray(v, dtype=np.int64)
                      for k, v in json.load(f).items()}

        keys = np.concatenate([
            old["key"].to_numpy(zero_copy_only=False),
            new["key"].to_numpy(zero_copy_only=False),
        ]) if (old.num_rows + new.num_rows) else np.array([], np.int64)
        touched = np.unique(_bucket_of(keys, self.n_buckets))
        nb = self.n_buckets

        new_b = _bucket_of(
            new["key"].to_numpy(zero_copy_only=False), nb
        ) if new.num_rows else np.array([], np.int64)

        @ray.remote
        def rewrite(b: int, ins: pa.Table, _root=self.root,
                    _owners=owners) -> tuple[int, int, int]:
            _recover_bucket(_root, b)
            live = _read_bucket(_root, b, SCHEMA)
            keep = live
            for otype, oids in _owners.items():
                if len(oids) == 0:
                    continue
                stale = pc.and_(
                    pc.is_in(keep["owner"],
                             value_set=pa.array(oids, pa.int64())),
                    pc.equal(keep["otype"], otype),
                )
                keep = keep.filter(pc.invert(stale))
            out = pa.concat_tables([keep, ins]) if ins.num_rows else keep
            _write_bucket_atomic(_root, b, out)
            return (b, live.num_rows - keep.num_rows, ins.num_rows)

        futs = []
        for b in touched:
            ins = new.filter(pa.array(new_b == b)) if new.num_rows \
                else SCHEMA.empty_table()
            futs.append(rewrite.remote(int(b), ins))
        results = ray.get(futs)

        man = {
            "window_id": window_id,
            "touched_buckets": [int(r[0]) for r in results],
            "deleted": int(sum(r[1] for r in results)),
            "inserted": int(sum(r[2] for r in results)),
            "seconds": time.perf_counter() - t0,
            "finished_at": time.time(),
        }
        os.makedirs(os.path.join(self.root, "_windows"), exist_ok=True)
        tmp = os.path.join(self.root, "_windows", f".{window_id}.tmp")
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, os.path.join(self.root, "_windows",
                                     f"{window_id}.json"))
        shutil.rmtree(sd, ignore_errors=True)
        return man
