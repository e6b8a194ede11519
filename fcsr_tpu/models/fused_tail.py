"""Fused GSR 'tail': spectral layer + GCN decoder + losses + gradients as
ONE Pallas kernel.

The fold-parallel trainer is op-dispatch-bound (~250 small ops/step, see
PERF.md). The model tail after the U-Net — GSRLayer, the two
GraphConvolutions, the output symmetrize/abs, and the reconstruction +
spectral-alignment L1 terms — is a pure jnp chain with no top_k/sort, so
the whole thing (forward AND its gradients w.r.t. the tail parameters and
the incoming features) collapses into a single Mosaic kernel: the kernel
body calls ``jax.value_and_grad`` on the pure function and Mosaic compiles
the resulting jaxpr (matmuls, selects, rsqrt — all supported).

The outer loss uses ``jax.custom_vjp``: forward runs the kernel once and
returns the precomputed gradients as residuals; backward just scales them
by the upstream cotangent (the loss is a scalar).

Exactness: identical math to GSRNet's tail (models/gsr.py) — verified
against the unfused path in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fcsr_tpu.core.normalize import fill_diagonal, normalize_adj, symmetrize

# error-compensated matmul for in-kernel use (see core/mosaic_mm.py for
# why DEFAULT-precision Mosaic dots need manual compensation)
from fcsr_tpu.core.mosaic_mm import mm as _mm

__all__ = ["tail_loss_fused", "tail_loss_reference"]


def _tail_loss(w_gsr, w1, w2, f, u_lr, u_hr, hr):
    """Pure-jnp tail: GSRLayer (collapsed exact form) -> gc1 -> gc2 ->
    symmetrize/diag/abs -> L1(pred, hr') + L1(w_gsr, u_hr).

    hr is compared exactly as passed: the reference's training recon term
    uses the RAW label (ref: utils/gsr_train.py:39-44 — ``padded_hr`` only
    feeds the eigh there), so production passes the unmodified HR stack;
    only the EVAL convention fills the label diagonal with 1 (ref:
    utils/gsr_train.py:66-68, mirrored in evaluate_gsr/eval_all).
    Returns the scalar sum of the two data-dependent loss terms (the
    lmbda * L1(net_outs, start_gcn_outs) term involves only U-Net tensors
    and stays outside the kernel)."""
    b_small = _mm(w_gsr, u_lr.T)
    f_d = jnp.abs(_mm(b_small, f))
    f_d = fill_diagonal(f_d, 1.0)
    adj = normalize_adj(f_d)
    x_out = _mm(adj, adj.T)
    x_out = jnp.abs(fill_diagonal(symmetrize(x_out), 1.0))
    h1 = _mm(adj, _mm(x_out, w1))
    h2 = _mm(adj, _mm(h1, w2))
    pred = jnp.abs(fill_diagonal(symmetrize(h2), 1.0))
    recon = jnp.mean(jnp.abs(pred - hr))
    spectral = jnp.mean(jnp.abs(w_gsr - u_hr))
    return recon + spectral, recon


def tail_loss_reference(w_gsr, w1, w2, f, u_lr, u_hr, hr):
    """Unfused value+grads (plain XLA) — the correctness oracle."""
    (loss, recon), grads = jax.value_and_grad(
        _tail_loss, argnums=(0, 1, 2, 3), has_aux=True)(
        w_gsr, w1, w2, f, u_lr, u_hr, hr)
    return loss, recon, grads


def _tail_kernel(wg_ref, w1_ref, w2_ref, f_ref, ulr_ref, uhr_ref, hr_ref,
                 loss_ref, recon_ref, gwg_ref, gw1_ref, gw2_ref, gf_ref):
    (loss, recon), (g_wg, g_w1, g_w2, g_f) = jax.value_and_grad(
        _tail_loss, argnums=(0, 1, 2, 3), has_aux=True)(
        wg_ref[:], w1_ref[:], w2_ref[:], f_ref[:], ulr_ref[:], uhr_ref[:],
        hr_ref[:])
    loss_ref[0, 0] = loss
    recon_ref[0, 0] = recon
    gwg_ref[:] = g_wg
    gw1_ref[:] = g_w1
    gw2_ref[:] = g_w2
    gf_ref[:] = g_f


@functools.partial(jax.jit, static_argnames=("interpret",))
def _tail_fused_call(w_gsr, w1, w2, f, u_lr, u_hr, hr,
                     interpret: bool = False):
    hr_dim, lr_dim = w_gsr.shape
    hidden = w1.shape[1]
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_out = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        _tail_kernel,
        in_specs=[vmem] * 7,
        out_specs=(smem_out, smem_out, vmem, vmem, vmem, vmem),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((hr_dim, lr_dim), jnp.float32),
            jax.ShapeDtypeStruct((hr_dim, hidden), jnp.float32),
            jax.ShapeDtypeStruct((hidden, hr_dim), jnp.float32),
            jax.ShapeDtypeStruct(f.shape, jnp.float32),
        ),
        interpret=interpret,
    )(w_gsr, w1, w2, f, u_lr, u_hr, hr)


@functools.lru_cache(maxsize=2)
def _make_tail_fused(interpret: bool):
    @jax.custom_vjp
    def tail(w_gsr, w1, w2, f, u_lr, u_hr, hr):
        loss, _, _, _, _, _ = _tail_fused_call(w_gsr, w1, w2, f, u_lr,
                                               u_hr, hr,
                                               interpret=interpret)
        return loss[0, 0]

    def fwd(w_gsr, w1, w2, f, u_lr, u_hr, hr):
        loss, recon, g_wg, g_w1, g_w2, g_f = _tail_fused_call(
            w_gsr, w1, w2, f, u_lr, u_hr, hr, interpret=interpret)
        return loss[0, 0], (g_wg, g_w1, g_w2, g_f)

    def bwd(residuals, ct):
        g_wg, g_w1, g_w2, g_f = residuals
        return (ct * g_wg, ct * g_w1, ct * g_w2, ct * g_f,
                None, None, None)

    tail.defvjp(fwd, bwd)
    return tail


def tail_loss_fused(w_gsr, w1, w2, f, u_lr, u_hr, hr,
                    interpret: bool = False):
    """Scalar tail loss whose forward+backward execute as one fused Pallas
    kernel. Differentiable in (w_gsr, w1, w2, f); u_lr/u_hr/hr are data."""
    return _make_tail_fused(bool(interpret))(w_gsr, w1, w2, f, u_lr,
                                             u_hr, hr)
