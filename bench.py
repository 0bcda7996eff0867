"""Benchmark harness (driver contract).

Runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS, default 32) and prints ONE JSON line:

  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N}

`--scaling` re-runs the harness in two fresh processes (num_cpus=8,
then 32) on the same input and reports both throughputs + scaling
efficiency (the sandbox evidence for the north rule's N vs 4N
cluster criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _headline_spatial(sf_dir: str, concurrency: int) -> tuple[float, int]:
    """Flagship: PIP join + kNN + tile cover over points derived from
    the lineitem table (the largest driver table), polygons anchored
    so the join has real hits."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from oluray.functions import geo
    from oluray.pipelines import flagship
    from oluray.sources import fixtures
    from oluray.stages import spatial

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linenumber"]
    )

    def to_points(batch: pa.Table) -> pa.Table:
        keys = (
            batch["l_orderkey"].to_numpy(zero_copy_only=False) * 8
            + batch["l_linenumber"].to_numpy(zero_copy_only=False)
        )
        lon, lat = geo.derive_lonlat(keys)
        n = len(keys)
        return pa.table(
            {
                "image_id": pa.array(keys.astype(np.int64)),
                "lon": pa.array(lon),
                "lat": pa.array(lat),
                "w": pa.array(np.full(n, 64, dtype=np.int32)),
                "h": pa.array(np.full(n, 64, dtype=np.int32)),
            }
        )

    pts = li.map_batches(to_points, batch_format="pyarrow")
    # polygons anchored on derived points (deterministic)
    anchor_keys = np.arange(1, 25, dtype=np.int64) * 1009
    alon, alat = geo.derive_lonlat(anchor_keys)
    polys = fixtures.make_change_polys(
        24, seed=42, span_deg=12.0, centers=list(zip(alon, alat))
    )
    t0 = time.perf_counter()
    hits = spatial.pip_join(
        pts, polys, res=7, id_col="image_id", concurrency=concurrency,
        carry_cols=("w", "h"),
    )
    cent_ref = None
    import ray

    cent_ref = ray.put(flagship.poly_centroids(polys))
    hits = hits.map_batches(
        flagship.AddCentroidDist,
        fn_constructor_kwargs=dict(cent_ref=cent_ref),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    tiles = spatial.tile_cover(hits, res=12, id_col="image_id")
    n = tiles.count()
    return time.perf_counter() - t0, n


def run_bench() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=ncpu, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from oluray.pipelines import queries as Q

    concurrency = max(2, ncpu // 4)
    timings: dict[str, float] = {}

    # warm the page cache (untimed) so we measure compute + shuffle
    import pyarrow.parquet as pq

    for t in ("lineitem", "events", "documents", "embeddings", "customer"):
        pq.read_table(f"{sf_dir}/{t}.parquet")

    headline_sec, headline_rows = _headline_spatial(sf_dir, concurrency)
    timings["spatial_flagship"] = round(headline_sec, 3)

    bench_queries = [
        ("latest_wins", Q.q_latest_wins),
        ("pricing_summary", Q.q_pricing_summary),
        ("pip_join", Q.q_pip_join),
        ("knn_assign", Q.q_knn_assign),
        ("dedup_exact", Q.q_dedup_exact),
        ("minhash_pairs", Q.q_minhash_pairs),
        ("ann_topk", Q.q_ann_topk),
        ("impact_closure", Q.q_impact_closure),
    ]
    for name, fn in bench_queries:
        t0 = time.perf_counter()
        res = fn(sf_dir)
        if hasattr(res, "count"):
            res.count()  # consume the stream
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    return {
        "metric": "spatial-join + tile-assignment headline (sec); per-query wall times",
        "value": timings["spatial_flagship"],
        "unit": "sec",
        "total_sec": total,
        "headline_rows": headline_rows,
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "num_cpus": ncpu,
    }


def run_scaling() -> dict:
    """Same job, same input, fresh processes at 8 and 32 CPUs."""
    out = {}
    for ncpu in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True,
        )
        out[ncpu] = json.loads(r.stdout.strip().splitlines()[-1])
    t_lo = out[8]["value"]
    t_hi = out[32]["value"]
    eff = (t_lo / t_hi) / (32 / 8)
    return {
        "metric": "scaling efficiency (8 -> 32 cpus, fresh processes, same input)",
        "sec_8": t_lo,
        "sec_32": t_hi,
        "rows_per_sec_8": round(out[8]["headline_rows"] / t_lo, 1),
        "rows_per_sec_32": round(out[32]["headline_rows"] / t_hi, 1),
        "scaling_efficiency": round(eff, 3),
        "total_sec_8": out[8]["total_sec"],
        "total_sec_32": out[32]["total_sec"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        result = run_bench()
        import ray

        ray.shutdown()
        print(json.dumps(result))
