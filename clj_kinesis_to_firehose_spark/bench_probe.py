"""Phase-timing probe for the streaming bench metrics (round-7 verdict
#5): the two streaming extended metrics are startup-dominated at small
SF (~90% of snapshot_changes_stream is checkpointed-stream setup, not
data work), so their single total could hide a real steady-state
regression. Ops wrap their construction and stream-execution sections
in :func:`phase`; ``bench.py`` reads the split AFTER timing the op and
reports both components beside the unchanged total.

Pure side-channel: never consulted by any query result, so operator
determinism is untouched. Last run wins (bench medians the totals it
measures itself; the split is diagnostic context for the same run).
"""

from __future__ import annotations

import time
from contextlib import contextmanager

_PHASES: dict[str, dict[str, float]] = {}


@contextmanager
def phase(op: str, name: str):
    """Record the wall-clock of the enclosed block as ``op``/``name``."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _PHASES.setdefault(op, {})[name] = round(time.perf_counter() - t0, 3)


def phases(op: str) -> dict[str, float]:
    """The last recorded phase split for ``op`` (empty if never run)."""
    return dict(_PHASES.get(op, {}))
