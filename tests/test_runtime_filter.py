"""The empty-block warning filter must be SELECTIVE: only the
empty-new-schema variant is dropped; a real drift (two non-empty
schemas disagreeing) still logs — that class catches genuine dtype
bugs (e.g. the r3 int64>2^53 pandas-padding bug)."""

import logging

from oluray.runtime import (
    _EmptyBlockDriftFilter, _RAY_EXEC_LOGGER,
    quiet_ray_empty_block_warnings,
)


def _rec(msg: str) -> logging.LogRecord:
    return logging.LogRecord("x", logging.WARNING, "f", 1, msg, None, None)


def test_filter_selectivity():
    f = _EmptyBlockDriftFilter()
    drop_pandas = (
        "Operator produced a RefBundle with a different schema than the "
        "previous one. Previous schema: PandasBlockSchema(names=['a'], "
        "types=[dtype('int64')]), new schema: "
        "PandasBlockSchema(names=[], types=[]). This may lead to "
        "unexpected behavior."
    )
    drop_arrow = (
        "Operator produced a RefBundle with a different schema than the "
        "previous one. Previous schema: k: int64\nv: double, "
        "new schema: . This may lead to unexpected behavior."
    )
    keep_real = (
        "Operator produced a RefBundle with a different schema than the "
        "previous one. Previous schema: PandasBlockSchema(names=['a'], "
        "types=[dtype('int64')]), new schema: PandasBlockSchema("
        "names=['a'], types=[dtype('float64')]). This may lead to "
        "unexpected behavior."
    )
    assert f.filter(_rec(drop_pandas)) is False
    assert f.filter(_rec(drop_arrow)) is False
    assert f.filter(_rec(keep_real)) is True
    assert f.filter(_rec("unrelated log line")) is True


def test_install_idempotent():
    quiet_ray_empty_block_warnings()
    quiet_ray_empty_block_warnings()
    lg = logging.getLogger(_RAY_EXEC_LOGGER)
    assert sum(isinstance(x, _EmptyBlockDriftFilter)
               for x in lg.filters) == 1
