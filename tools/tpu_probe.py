#!/usr/bin/env python
"""One-shot TPU tunnel health probe.

Exit 0 and print the first-op latency when the tunnelled device answers;
exit 1 on timeout. Observed states (ROUND_NOTES landmines):

  * healthy: first op ~1-2 s
  * degraded: ~10 s+ (expect 2-4x wall-clock on host-control paths)
  * stalled: never returns — kill the process and retry later; multi-
    hour outages have been observed. Always bound TPU work with
    ``timeout`` and check this probe before long runs.

Usage:  timeout 90 python tools/tpu_probe.py && echo healthy
"""
import time

t0 = time.time()
import jax
import jax.numpy as jnp

x = jnp.ones((128, 128))
(x @ x).block_until_ready()
print(f"device={jax.devices()[0]} first_op={time.time() - t0:.1f}s")
