"""IO adapter: Lance preferred, Parquet fallback.

The north-rule input is a Lance table of image + caption pairs
(`BASELINE.json` input_hint: `read_lance` / `write_lance`). This
sandbox has no `lance` package, so every reader/writer here resolves
the format at call time:

- a path ending in `.lance` (or containing a Lance manifest) is read
  with `ray.data.read_lance` / written with `Dataset.write_lance`
  WHEN the `lance` package is importable;
- otherwise Parquet, same call shape.

On a real cluster with `pylance` installed, the flagship pipeline and
the resumable sink run against Lance datasets without a code change;
in this sandbox the Parquet fallback keeps everything testable.
"""

from __future__ import annotations

import os

import ray.data


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def is_lance_path(path: str) -> bool:
    return path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions"))


def read_table(path: str, columns: list[str] | None = None, **kw) -> ray.data.Dataset:
    """Read a table, dispatching on path format. Column pruning is
    pushed into the read for both formats (at 100 TB, a read that
    loads all columns for a 2-column transform is wrong)."""
    if is_lance_path(path):
        if lance_available():
            return ray.data.read_lance(path, columns=columns, **kw)
        raise ImportError(
            f"{path} is a Lance dataset but the 'lance' package is not "
            "installed; install pylance or convert to parquet"
        )
    return ray.data.read_parquet(path, columns=columns, **kw)


def write_table(ds: ray.data.Dataset, path: str, **kw) -> None:
    """Write a Dataset, dispatching on path format."""
    if path.endswith(".lance"):
        if lance_available():
            ds.write_lance(path, **kw)
            return
        raise ImportError(
            f"{path} targets Lance but the 'lance' package is not installed"
        )
    ds.write_parquet(path, **kw)


def read_images(path: str, with_bytes: bool = False) -> ray.data.Dataset:
    """Read the north-rule image table
    (image_id, bytes, w, h, fmt, caption, phash). The scale contract
    (`pipelines/flagship.py`): `bytes` stays OUT of the join pipeline —
    by default only the metadata projection is read, and row groups
    holding multi-MB blobs never leave storage."""
    cols = ["image_id", "w", "h", "fmt", "caption", "phash"]
    if with_bytes:
        cols.insert(1, "bytes")
    return read_table(path, columns=cols)
