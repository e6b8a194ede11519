"""Device-mesh data parallelism over the subject/batch axis.

The reference is strictly single-device (hardcoded ``cuda:2`` etc.,
ref: unet-transformer.py:511); its natural scaling axis is the subject
batch, since the whole model fits in a sliver of one core's HBM (largest
weight is 268x160, ref: models/layers.py:18).  Here training steps shard the
connectome batch over a 1-D ``('batch',)`` mesh; XLA inserts the psum for
the mean-gradient all-reduce over ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fcsr_tpu.core.normalize import unpad
from fcsr_tpu.train.losses import gsr_composite_loss

__all__ = ["batch_mesh", "shard_batch", "make_sharded_batch_step",
           "make_sharded_generic_step"]


def batch_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name 'batch'."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), ("batch",))


def shard_batch(mesh: Mesh, *arrays):
    """Place arrays with their leading (batch) axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P("batch"))
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out if len(out) > 1 else out[0]


def make_sharded_batch_step(model, tx: optax.GradientTransformation,
                            mesh: Mesh, lmbda: float = 16.0,
                            padding: int = 0):
    """Jitted data-parallel training step: params/opt-state replicated,
    connectome batch sharded over 'batch'; loss is the batch mean of the
    per-subject GSR composite loss, so the gradient all-reduce is a single
    psum that XLA lays on ICI.
    """
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P("batch"))

    def batch_loss(params, lr_b, hr_b, u_lr_b, u_hr_b):
        def one(lr, hr, u_lr, u_hr):
            pred, net_outs, start_outs, _ = model.apply(params, lr,
                                                        u_lr=u_lr)
            pred = unpad(pred, padding)
            w = params["params"]["layer"]["weights"]
            loss, err = gsr_composite_loss(pred, net_outs, start_outs, w,
                                           u_hr, hr, lmbda)
            return loss, err

        losses, errs = jax.vmap(one)(lr_b, hr_b, u_lr_b, u_hr_b)
        return jnp.mean(losses), jnp.mean(errs)

    @partial(jax.jit,
             in_shardings=(replicated, replicated, batch_sharded,
                           batch_sharded, batch_sharded, batch_sharded),
             out_shardings=(replicated, replicated, replicated, replicated),
             donate_argnums=(0, 1))
    def step(params, opt_state, lr_b, hr_b, u_lr_b, u_hr_b):
        (loss, err), grads = jax.value_and_grad(batch_loss, has_aux=True)(
            params, lr_b, hr_b, u_lr_b, u_hr_b)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, err

    return step


def make_sharded_generic_step(model, tx: optax.GradientTransformation,
                              mesh: Mesh, criterion):
    """Data-parallel training step for any batched flax model (the MLP
    family's multi-chip path): variables/opt-state replicated, the
    (batch, ...) inputs/targets sharded over 'batch'; mean-loss
    gradients all-reduce with one psum on ICI. Mutable collections
    (BatchNorm/SpectralNorm stats) are computed in the single logical
    program — sharding is layout, not semantics — so they stay
    consistent across devices."""
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P("batch"))

    @partial(jax.jit,
             in_shardings=(replicated, replicated, batch_sharded,
                           batch_sharded, replicated),
             out_shardings=(replicated, replicated, replicated),
             donate_argnums=(0, 1))
    def step(variables, opt_state, x_b, y_b, dropout_key):
        params = variables["params"]
        aux = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(params):
            outs = model.apply({"params": params, **aux}, x_b,
                               train=True, mutable=list(aux),
                               rngs={"dropout": dropout_key})
            pred, new_aux = outs
            return criterion(pred, y_b), new_aux

        (loss, new_aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return {"params": params, **new_aux}, opt_state, loss

    return step
