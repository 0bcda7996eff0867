"""Lance-preferring IO adapter: fallback paths (no lance in sandbox)."""

import pandas as pd
import pytest
import ray.data

from oluray.sources import io

SF = "/root/testdata/sf0.001"


def test_read_table_parquet_fallback_with_pruning():
    ds = io.read_table(f"{SF}/customer.parquet", columns=["c_custkey"])
    assert ds.schema().names == ["c_custkey"]
    assert ds.count() > 0


def test_lance_path_without_lance_raises(tmp_path):
    if io.lance_available():  # pragma: no cover - sandbox has no lance
        pytest.skip("lance installed; fallback path not reachable")
    with pytest.raises(ImportError):
        io.read_table(str(tmp_path / "images.lance"))
    ds = ray.data.from_pandas(pd.DataFrame({"a": [1, 2]}))
    with pytest.raises(ImportError):
        io.write_table(ds, str(tmp_path / "out.lance"))


def test_write_table_parquet_roundtrip(tmp_path):
    ds = ray.data.from_pandas(pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]}))
    out = str(tmp_path / "out_parquet")
    io.write_table(ds, out)
    back = io.read_table(out)
    assert back.count() == 3
