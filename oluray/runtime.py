"""Runtime helpers shared by the test / gate / bench harnesses (NOT
imported by the library's operator modules — harness-side policy only).
"""

from __future__ import annotations

import logging

_RAY_EXEC_LOGGER = "ray.data._internal.execution.streaming_executor_state"


class _EmptyBlockDriftFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:
        msg = record.getMessage()
        if "Operator produced a RefBundle with a different schema" not in msg:
            return True
        # drop ONLY the empty-new-schema variant; a real drift (two
        # non-empty schemas disagreeing) still logs
        return not (
            "new schema: PandasBlockSchema(names=[], types=[])" in msg
            or "new schema: ." in msg
        )


def quiet_ray_empty_block_warnings() -> None:
    """Suppress ONLY Ray's empty-block schema-"drift" warning.

    Ray Data's sort / groupby emits zero-row blocks with NO schema by
    design (`ArrowBlockAccessor._empty_table()` returns a 0-column
    table; pandas lineage shows as `PandasBlockSchema(names=[])`),
    and the streaming executor then warns `Operator produced a
    RefBundle with a different schema` with an EMPTY new schema.
    Verified against the Ray 2.49 sources: this is emitted by the
    sort exchange itself before any UDF runs, so returning typed
    empties from every UDF (which this repo does) cannot eliminate
    it. The filter is idempotent and drops exactly that variant —
    warnings where two NON-empty schemas disagree still surface,
    because those are the ones that catch real dtype bugs (e.g. the
    r3 int64>2^53 pandas-padding bug)."""
    lg = logging.getLogger(_RAY_EXEC_LOGGER)
    if not any(isinstance(f, _EmptyBlockDriftFilter) for f in lg.filters):
        lg.addFilter(_EmptyBlockDriftFilter())
