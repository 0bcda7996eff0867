"""Meta-checks on the correctness-gate comparator: the compare used
by tools/check_correctness.py (and mirrored in every wave test) must
FAIL on value, schema, and cardinality drift — guarding against a
vacuously-green gate."""
import pandas as pd
import pytest


def _compare(got: pd.DataFrame, exp: pd.DataFrame) -> bool:
    """The gate's exact semantics: sorted column names, column-sorted
    rows, string-exact values."""
    cols = sorted(got.columns)
    if sorted(exp.columns) != cols:
        return False
    gs = got[cols].sort_values(cols).reset_index(drop=True)
    es = exp[cols].sort_values(cols).reset_index(drop=True)
    if gs.shape != es.shape:
        return False
    return bool((gs.astype(str).values == es.astype(str).values).all())


BASE = pd.DataFrame({"k": [1, 2, 3], "v": [10, 20, 30]})


def test_identical_passes():
    assert _compare(BASE, BASE.copy())


def test_row_order_invariant():
    assert _compare(BASE, BASE.iloc[::-1].reset_index(drop=True))


def test_column_order_invariant():
    assert _compare(BASE, BASE[["v", "k"]])


def test_value_drift_fails():
    bad = BASE.copy()
    bad.loc[1, "v"] = 21
    assert not _compare(BASE, bad)


def test_schema_drift_fails():
    assert not _compare(BASE, BASE.rename(columns={"v": "val"}))


def test_cardinality_drift_fails():
    assert not _compare(BASE, BASE.head(2))
    assert not _compare(BASE, pd.concat([BASE, BASE.tail(1)],
                                        ignore_index=True))


def test_dtype_text_drift_fails():
    """int 10 vs float 10.0 must not silently pass (string compare
    distinguishes them — the driver's hash does too)."""
    f = BASE.copy()
    f["v"] = f["v"].astype("float64")
    assert not _compare(BASE, f)


def test_tool_comparator_agrees():
    """tools/check_correctness.py's comparator rejects the same
    drift (import-level spot check, no Ray needed)."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "ccheck", pathlib.Path(__file__).resolve().parents[1]
        / "tools" / "check_correctness.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert hasattr(mod, "main")
