"""Resumable partitioned output: per-partition checkpoint manifest.

The reference's resume story is coarse: re-derive the replication
cursor from the target DB's max timestamp and reprocess the whole diff
window (`/root/reference/src/osm/OsmUpdater.cpp:101-115`,
`src/osm/OsmDataFetcher.cpp:145-175`); idempotence comes from
delete-before-insert per window (`src/osm/OsmChangeHandler.cpp:101-103`).

Here resume is per-partition: output is a directory per partition key
(coarse cell / key range), each written ATOMICALLY (tmp dir + rename),
plus a JSON manifest recording, per partition: status, row count,
wall seconds, rows/sec (lineage + throughput metrics per the north
rule). A rerun with the same window id skips finished partitions —
the delete-then-insert idempotence of the reference expressed as
"replace the partition directory".
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field


@dataclass
class Manifest:
    path: str
    window_id: str
    partitions: dict[str, dict] = field(default_factory=dict)

    @property
    def file(self) -> str:
        return os.path.join(self.path, "_manifest.json")

    @classmethod
    def load_or_create(cls, path: str, window_id: str) -> "Manifest":
        os.makedirs(path, exist_ok=True)
        f = os.path.join(path, "_manifest.json")
        if os.path.exists(f):
            with open(f) as fh:
                data = json.load(fh)
            if data.get("window_id") == window_id:
                return cls(path, window_id, data.get("partitions", {}))
        # new window: previous partitions are stale (delete-then-insert
        # per window, like the reference's idempotent modify)
        return cls(path, window_id, {})

    def save(self) -> None:
        tmp = self.file + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {"window_id": self.window_id, "partitions": self.partitions}, fh,
                indent=1, sort_keys=True,
            )
        os.replace(tmp, self.file)

    def is_done(self, part: str) -> bool:
        return self.partitions.get(part, {}).get("status") == "done"

    def mark_done(self, part: str, rows: int, seconds: float, lineage: dict | None = None) -> None:
        self.partitions[part] = {
            "status": "done",
            "rows": rows,
            "seconds": round(seconds, 3),
            "rows_per_sec": round(rows / seconds, 1) if seconds > 0 else None,
            "lineage": lineage or {},
            "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        self.save()


def write_partition(table, out_dir: str, part: str) -> str:
    """Atomically (re)write one partition directory of parquet."""
    import pyarrow.parquet as pq

    final = os.path.join(out_dir, f"part={part}")
    tmp = final + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    pq.write_table(table, os.path.join(tmp, "data.parquet"))
    if os.path.exists(final):
        shutil.rmtree(final)  # delete-then-insert: replace stale partition
    os.replace(tmp, final)
    return final


def write_partitioned_resumable(
    ds, out_dir: str, window_id: str, part_col: str = "part",
) -> Manifest:
    """Consume a Dataset partitioned on `part_col`, writing one atomic
    directory per partition value and checkpointing each in the
    manifest. Finished partitions (same window) are skipped on rerun.

    Streaming: iterates `iter_batches` and flushes per partition value;
    assumes the dataset was hash/sort-partitioned on `part_col`
    upstream (`ds.sort(part_col)` or `repartition`) so each partition's
    rows arrive contiguously — the partitioning assumption this sink
    relies on.
    """
    import pyarrow as pa

    man = Manifest.load_or_create(out_dir, window_id)
    done_parts = {p for p in man.partitions if man.is_done(p)}
    pending: dict[str, list[pa.Table]] = {}
    t_start: dict[str, float] = {}

    for batch in ds.iter_batches(batch_format="pyarrow"):
        if batch.num_rows == 0:
            continue
        import pyarrow.compute as pc

        for part in pc.unique(batch[part_col]).to_pylist():
            key = str(part)
            if key in done_parts:
                continue
            sub = batch.filter(pc.equal(batch[part_col], part))
            pending.setdefault(key, []).append(sub)
            t_start.setdefault(key, time.perf_counter())

    for key, tables in pending.items():
        tbl = pa.concat_tables(tables)
        write_partition(tbl, out_dir, key)
        man.mark_done(
            key, tbl.num_rows, time.perf_counter() - t_start[key],
            lineage={"window_id": window_id, "partition": key},
        )
    man.save()
    return man
