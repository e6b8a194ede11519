"""Host<->device transfer helpers.

Two empirical facts about the (tunnelled) TPU runtime drive this module:

  * ``device_put`` of >2-D arrays can take a pathologically slow path (the
    tiled-relayout transfer), while the SAME bytes as a flat 1-D buffer
    ship at full bandwidth — so all transfers are staged flat and reshaped
    on device (a cheap compiled reshape).
  * round trips are expensive and occasionally stall, so pipelines should
    ship inputs once, keep them device-resident, and pull back scalars.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np

__all__ = ["device_put_fast", "to_host", "init_on_host"]


def init_on_host(thunk):
    """Run a (flax) parameter-init thunk on the host CPU backend.

    An un-jitted ``Module.init`` evaluates every initializer op EAGERLY
    on the default device — through the tunnelled TPU runtime that is
    hundreds of per-op round trips (measured: 3 GAT U-Net inits cost
    ~13-19 s of a 29 s training run; tools/experiments/gat_fixed_cost.py).
    Params are tiny; initializing them on the local CPU backend and
    shipping the result is orders of magnitude cheaper.

    ``thunk`` must create its own example inputs so they are born on
    the CPU (an input committed to the TPU would drag ops back there).
    Falls back to running in place when no CPU backend exists.
    """
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return thunk()
    with jax.default_device(cpu):
        return thunk()


@partial(jax.jit, static_argnames=("shape",))
def _reshape_to(flat, shape):
    return flat.reshape(shape)


def device_put_fast(x, device=None):
    """device_put via flat staging; returns a device array of x's shape."""
    x = np.ascontiguousarray(x)
    flat = jax.device_put(x.reshape(-1), device)
    if x.ndim <= 1:
        return flat
    return _reshape_to(flat, tuple(x.shape))


@jax.jit
def _flatten(x):
    return x.reshape(-1)


def to_host(x) -> np.ndarray:
    """Device -> host via flat staging."""
    shape = x.shape
    flat = np.asarray(_flatten(x))
    return flat.reshape(shape)
