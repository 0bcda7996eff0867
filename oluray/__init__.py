"""oluray — a Ray-Data-native spatial-join + tiling engine.

A brand-new engine (NOT a port) with the query/data-processing
capabilities of the reference `nicolano/osm-live-updates` (C++17, see
/root/reference), re-expressed Ray-Data-first:

- create/modify/delete **diff semantics** (latest-wins merge, impact
  closure, delete-then-insert idempotence) as batched relational
  operators over Arrow blocks;
- **geospatial kernels** (hierarchical cell index, point-in-polygon,
  kNN, raster<->vector tile cover) as vectorized numpy/pyarrow
  `map_batches` stages;
- **stateful stages** (polygon index, tile writers) as actor pools;
- per-partition **checkpoint manifests** for resumable output.

Everything here derives from public knowledge only: the Ray / Ray Data
and Apache Arrow APIs, and the reference repo's observable behavior.
"""

__version__ = "0.1.0"
