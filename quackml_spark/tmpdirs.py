"""Ephemeral working directories for registered demo queries.

Several registered queries build a PERSISTED structure (a dedup index,
a warehouse, a stream state dir) as part of demonstrating an operator
lifecycle. Those directories are per-run scratch: register them for
removal at interpreter exit so repeated sweeps/bench runs don't
accumulate multi-hundred-MB /tmp debt (the same discipline as
testing._spill_dir for DuckDB oracle spill — review catch).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile


def ephemeral_dir(prefix: str) -> str:
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d
