"""Cluster job entrypoint for the flagship window pipeline.

The north rule's submission path, as one self-contained script:

    ray job submit --working-dir . -- \
        python tools/run_job.py --images s3://.../images \
        --polys s3://.../window_0042_polys.parquet \
        --out s3://.../tiles --window-id w0042 [--materialize-tiles]

Connects to the cluster it was submitted into (``address="auto"``;
falls back to a local session outside a cluster so the same script is
testable in-sandbox), runs `flagship.run_window` (PIP + kNN + tile
cover over the window's polygons, resumable per-partition sink), and
prints ONE JSON metrics line — rows, wall seconds, rows/sec, and the
skipped/done partition split so a resumed run is visible as such.

Re-submitting the identical job is a no-op per finished partition
(the manifest skip path); killing it mid-window and re-submitting
resumes — the property `tests/test_checkpoint.py` pins down.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", required=True,
                   help="images table path (Lance or parquet)")
    p.add_argument("--polys", required=True,
                   help="changeset polygon table (parquet: poly_id, op, ring)")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--window-id", required=True)
    p.add_argument("--pip-res", type=int, default=8)
    p.add_argument("--materialize-tiles", action="store_true",
                   help="also re-join bytes per output partition")
    p.add_argument("--address", default=None,
                   help='override ray address (default: "auto" under a '
                        'cluster, local otherwise)')
    args = p.parse_args(argv)

    import pyarrow.parquet as pq
    import ray

    if not ray.is_initialized():
        addr = args.address or os.environ.get("RAY_ADDRESS", "auto")
        try:
            ray.init(address=addr, include_dashboard=False,
                     logging_level="ERROR")
        except ConnectionError:
            ray.init(address="local", include_dashboard=False,
                     logging_level="ERROR")

    from oluray.pipelines import flagship
    from oluray.sources.io import read_table

    t0 = time.perf_counter()
    images = read_table(args.images)
    polys = pq.read_table(args.polys)
    man = flagship.run_window(images, polys, args.out, args.window_id,
                              pip_res=args.pip_res)
    parts = man.partitions
    n_rows = sum(int(v.get("rows", 0)) for v in parts.values())
    if args.materialize_tiles:
        flagship.materialize_tiles(images, args.out,
                                   os.path.join(args.out, "tiles"),
                                   args.window_id)
    wall = time.perf_counter() - t0
    metrics = {
        "window_id": args.window_id,
        "rows": n_rows,
        "partitions": len(parts),
        "wall_s": round(wall, 3),
        "rows_per_s": round(n_rows / wall, 1) if wall > 0 else None,
        "out": args.out,
    }
    print(json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    main()
