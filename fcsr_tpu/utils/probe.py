"""Bounded device-liveness probe.

The tunnelled TPU runtime has been observed to stall for hours: any
device op blocks forever at zero CPU. Long-running entry points
(bench.py, tools/family_bench.py) call ``require_live_device()`` up
front so a dead tunnel becomes a fast, diagnosable exit instead of a
hang into the caller's opaque timeout. A degraded-but-alive tunnel
(first op ~11 s) passes comfortably within the default 120 s bound
(override with FCSR_BENCH_PROBE_TIMEOUT).
"""

from __future__ import annotations

import os
import sys
import threading
import time

__all__ = ["require_live_device"]


def require_live_device(timeout_s: float | None = None) -> None:
    """Block until one device op completes, or exit diagnosably.

    Waits on a SINGLE probe op (a tunnel that recovers mid-wait
    completes the originally blocked op, so re-issuing probes buys
    nothing) in 30 s slices with stderr heartbeats, so a driver log of
    a long wait shows liveness-waiting rather than a silent hang.
    """
    if timeout_s is None:
        timeout_s = float(os.environ.get("FCSR_BENCH_PROBE_TIMEOUT",
                                         "120"))
    ok = threading.Event()

    def _probe():
        import jax.numpy as jnp
        x = jnp.ones((64, 64))
        (x @ x).block_until_ready()
        ok.set()

    threading.Thread(target=_probe, daemon=True).start()
    t0 = time.monotonic()
    while not ok.wait(timeout=min(30.0, timeout_s)):
        waited = time.monotonic() - t0
        if waited >= timeout_s:
            raise SystemExit(
                f"device probe did not complete within {timeout_s:.0f}s — "
                "the TPU tunnel looks stalled (see tools/tpu_probe.py); "
                "retry when it recovers")
        print(f"[probe] device op still pending after {waited:.0f}s "
              f"(waiting up to {timeout_s:.0f}s)...", file=sys.stderr,
              flush=True)
