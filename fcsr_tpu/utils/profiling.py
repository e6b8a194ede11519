"""Lightweight profiling: phase timers + optional jax profiler traces.

The reference has no profiling beyond ad-hoc ``time.time`` around CSV loads
(ref: utils/data.py:57-61); the TPU build needs per-phase wall-clock (to
prove the <60 s north star) and an escape hatch into ``jax.profiler`` for
kernel-level traces.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict

__all__ = ["PhaseTimer", "trace_if_enabled"]


class PhaseTimer:
    """Accumulating named-phase wall-clock timer.

    >>> t = PhaseTimer()
    >>> with t("train"):
    ...     ...
    >>> t.report()
    {'train': ...}
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = (self.totals.get(name, 0.0)
                                 + time.perf_counter() - t0)

    def report(self) -> Dict[str, float]:
        return dict(self.totals)


@contextlib.contextmanager
def trace_if_enabled(out_dir: str = None):
    """jax.profiler trace context, gated on FCSR_TRACE_DIR or an explicit
    directory; no-op otherwise."""
    out_dir = out_dir or os.environ.get("FCSR_TRACE_DIR")
    if not out_dir:
        yield
        return
    import jax

    with jax.profiler.trace(out_dir):
        yield
