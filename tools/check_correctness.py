"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at a given sf_dir and compares against
``oracle_sql()`` via DuckDB: row count, sorted column names, and an
order-insensitive value hash (rows sorted by all columns, hashed).

Usage: python tools/check_correctness.py [sf_dir] [name1,name2,...]
(the optional second arg restricts the run to those query names)
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            df[c] = col.astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(col):
            df[c] = col.round(9)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return hashlib.md5(pd.util.hash_pandas_object(df, index=False).values.tobytes()).hexdigest()


def main(sf_dir: str, only: set[str] | None = None) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    from oluray.runtime import quiet_ray_empty_block_warnings

    quiet_ray_empty_block_warnings()

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    if only:
        unknown = only - set(qs)
        if unknown:
            raise SystemExit(f"unknown query names: {sorted(unknown)}")
        qs = {n: f for n, f in qs.items() if n in only}
    failures = 0
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL  {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows ({dt:.1f}s) [rows-only]")
            if len(got) == 0:
                print(f"WARN  {name}: produced 0 rows")
            continue
        exp = con.sql(oracles[name]).df()
        ok_rows = len(got) == len(exp)
        ok_cols = sorted(got.columns) == sorted(exp.columns)
        ok_hash = ok_rows and ok_cols and value_hash(got) == value_hash(exp)
        status = "ok   " if (ok_rows and ok_cols and ok_hash) else "FAIL "
        if status.startswith("FAIL"):
            failures += 1
        print(
            f"{status} {name}: rows {len(got)}/{len(exp)} cols={'ok' if ok_cols else sorted(got.columns)}"
            f" hash={'ok' if ok_hash else 'MISMATCH'} ({dt:.1f}s)"
        )
        if not ok_hash and ok_rows and ok_cols and len(got) > 0:
            g = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
            x = exp[sorted(exp.columns)].sort_values(sorted(exp.columns)).reset_index(drop=True)
            diff = (g != x) & ~(g.isna() & x.isna())
            bad = diff.any(axis=1)
            print("  first diffs:\n", g[bad].head(3), "\n  vs\n", x[bad].head(3))
            print("  dtypes got:", dict(g.dtypes.astype(str)), "exp:", dict(x.dtypes.astype(str)))
    print("FAILURES:", failures)
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    rc = main(sf, only)
    import ray

    ray.shutdown()
    sys.exit(1 if rc else 0)
