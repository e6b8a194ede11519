"""Whole-training-step fusion: the full GSR-Net loss (U-Net + spectral
layer + decoder + all three loss terms), forward AND gradients, as ONE
Mosaic kernel.

Two observations make this possible:

1. **The U-Net's adjacency is never consumed numerically.** Faithful to
   the reference, its 'GCN' blocks are Linear layers that ignore A
   (ref: models/ops.py:50-61); pooling slices A but nothing ever
   multiplies it. So the U-Net is a pure MLP over the identity features
   with learned top-k gating — no graph op needs to enter the kernel.

2. **Top-k compaction is expressible gather-free.** Mosaic has no
   gather/sort, but the rank of each score is one vectorized comparison
   sum (with lower-index tie-break, matching lax.top_k's stable order):

       rank_i = sum_j [s_j > s_i] + sum_{j<i} [s_j == s_i]

   and the selection becomes a one-hot (k, n) matrix P[m, i] = [rank_i == m]
   so pooling is ``P @ (X * s)`` and unpooling is ``P^T @ X`` — MXU
   matmuls. Gradients through P (a comparison) are zero, exactly matching
   lax.top_k's index-stop-gradient semantics, while value gradients flow
   through the matmuls like the gather/scatter adjoints they replace.

The kernel body computes ``jax.value_and_grad`` of the pure-jnp step and
Mosaic compiles the joint jaxpr. Exactness vs the unfused model is
verified in tests (same trajectory up to float reassociation).

STATUS (v5e, 2026-08): the pure rank-select formulation is bit-exact vs
the gather/top_k model under XLA (max grad diff 0.0, tested) and the
kernels are exact in interpret mode; on hardware, however, the joint
whole-step kernel and the U-Net backward kernel CRASH the TPU compile
service (HTTP 500, no diagnostics — the U-Net forward alone and the tail
kernel compile and run fine, so this is a compiler capacity issue with
very large kernel jaxprs). The production fused path is therefore the
tail kernel (models/fused_tail.py, cfg.fused_tail); this module stays as
the validated formulation for when the toolchain catches up.
Also note: Mosaic dots only support DEFAULT precision (HIGHEST crashes
the compile service, HIGH is rejected) — kernels use a manual
error-compensated bf16x3 matmul (``_mm``) for f32-class accuracy.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fcsr_tpu.models.fused_tail import _tail_loss
from fcsr_tpu.models.gsr import pool_sizes

def _mm(a, b):
    """Error-compensated bf16x3 matmul for use inside Mosaic kernels.

    Mosaic supports only DEFAULT dot precision (single-pass bf16; HIGHEST
    crashes the TPU compile service, HIGH is rejected), so the three-pass
    decomposition a_hi@b_hi + a_hi@b_lo + a_lo@b_hi is built manually —
    same accuracy class as XLA's f32 matmuls (~1e-6 relative)."""
    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
    a_lo = a - a_hi
    b_lo = b - b_hi
    dot = lambda x, y: jnp.matmul(x, y, preferred_element_type=jnp.float32)
    return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)

__all__ = ["step_loss_pure", "step_value_and_grad_fused",
           "unet_forward_rankselect", "unet_fused"]


def _topk_projection(scores, k: int):
    """(k, n) one-hot selection matrix reproducing lax.top_k's ordering
    (descending value, ties broken by lower index)."""
    n = scores.shape[0]
    s_i = scores[None, :]
    s_j = scores[:, None]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    idx_t = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    greater = (s_j > s_i) | ((s_j == s_i) & (idx < idx_t))
    rank = jnp.sum(greater.astype(jnp.int32), axis=0)  # rank of node i
    # integer iota only — Mosaic rejects float tpu.iota
    slots = jax.lax.broadcasted_iota(jnp.int32, (k, n), 0)
    return (slots == rank[None, :]).astype(scores.dtype)


def unet_forward_rankselect(net_params, ks: Sequence[float], lr_dim: int):
    """Gather-free Graph U-Net forward (identity input features), exactly
    equivalent to models/gsr.py::GraphUnet under GSRNet's usage.

    ``net_params``: the flax param subtree params['params']['net'].
    Returns (net_outs, start_gcn_outs).
    """
    sizes = pool_sizes(lr_dim, ks)

    def lin(name, x):
        p = net_params[name]["proj"]
        return _mm(x, p["kernel"]) + p["bias"]

    x = lin("start_gcn", jnp.eye(lr_dim, dtype=jnp.float32))
    start_outs = x
    org_x = x

    projections = []
    down_outs = []
    for i in range(len(ks)):
        x = lin(f"down_gcns_{i}", x)
        down_outs.append(x)
        p_pool = net_params[f"pools_{i}"]["proj"]
        # bias add via an explicit ones-matmul: its adjoint is a matmul,
        # sidestepping Mosaic's unsupported tiny odd-size lane reductions
        # (vector.multi_reduction over e.g. (1, 61)) in the backward pass
        n_i = x.shape[0]
        ones_col = jnp.ones((n_i, 1), dtype=jnp.float32)
        logits = (_mm(x, p_pool["kernel"])
                  + _mm(ones_col, p_pool["bias"][None, :]))
        scores = jax.nn.sigmoid(logits[:, 0] / 100.0)
        proj = _topk_projection(scores, sizes[i])  # (k_i, n_i)
        kept_scores = _mm(proj, scores[:, None])
        x = _mm(proj, x) * kept_scores
        projections.append(proj)

    x = lin("bottom_gcn", x)

    for i in range(len(ks)):
        up = len(ks) - i - 1
        x = _mm(projections[up].T, x)  # unpool
        x = lin(f"up_gcns_{i}", x)
        x = x + down_outs[up]

    x = jnp.concatenate([x, org_x], axis=1)
    net_outs = lin("end_gcn", x)
    return net_outs, start_outs


def step_loss_pure(params, a_norm, hr, u_lr, u_hr, ks: Sequence[float],
                   lr_dim: int, lmbda: float):
    """The full GSR training-step loss as a pure jnp function of the flax
    param tree (no gathers, no eigh — everything Mosaic can lower).
    Returns (loss, recon_error)."""
    del a_norm  # the U-Net never consumes it (see module docstring)
    p = params["params"]
    net_outs, start_outs = unet_forward_rankselect(p["net"], ks, lr_dim)
    tail, recon = _tail_loss(p["layer"]["weights"], p["gc1"]["weight"],
                             p["gc2"]["weight"], net_outs, u_lr, u_hr, hr)
    loss = lmbda * jnp.mean(jnp.abs(net_outs - start_outs)) + tail
    return loss, recon


@functools.lru_cache(maxsize=8)
def _make_unet_fused(ks: tuple, lr_dim: int, hr_dim: int,
                     interpret: bool, treedef_container: tuple):
    """Fused U-Net as custom_vjp: one fwd kernel, one bwd kernel (which
    rematerializes the forward and runs jax.vjp in-kernel). The single
    whole-step kernel (forward+backward of everything) crashes the TPU
    compile service, so the step is split at the U-Net/tail boundary —
    each half compiles fine."""
    (treedef,) = treedef_container
    n_leaves = treedef.num_leaves

    def flat_unet(leaves):
        p = jax.tree_util.tree_unflatten(treedef, leaves)
        return unet_forward_rankselect(p, ks, lr_dim)

    def fwd_kernel(*refs):
        leaf_refs, out_refs = refs[:n_leaves], refs[n_leaves:]
        net, start = flat_unet([r[:] for r in leaf_refs])
        out_refs[0][:] = net
        out_refs[1][:] = start

    def bwd_kernel(*refs):
        leaf_refs = refs[:n_leaves]
        ct_net_ref, ct_start_ref = refs[n_leaves], refs[n_leaves + 1]
        grad_refs = refs[n_leaves + 2:]
        _, vjp = jax.vjp(flat_unet, [r[:] for r in leaf_refs])
        (grads,) = vjp((ct_net_ref[:], ct_start_ref[:]))
        for g_ref, g in zip(grad_refs, grads):
            g_ref[:] = g

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape_fwd = (jax.ShapeDtypeStruct((lr_dim, hr_dim), jnp.float32),) * 2

    @jax.custom_vjp
    def unet(leaves):
        return pl.pallas_call(
            fwd_kernel, in_specs=[vmem] * n_leaves,
            out_specs=(vmem, vmem), out_shape=out_shape_fwd,
            interpret=interpret)(*leaves)

    def fwd(leaves):
        return unet(leaves), tuple(leaves)

    def bwd(leaves, cts):
        ct_net, ct_start = cts
        leaves = list(leaves)
        grads = pl.pallas_call(
            bwd_kernel, in_specs=[vmem] * (n_leaves + 2),
            out_specs=tuple([vmem] * n_leaves),
            out_shape=tuple(jax.ShapeDtypeStruct(l.shape, l.dtype)
                            for l in leaves),
            interpret=interpret)(*leaves, ct_net, ct_start)
        return (list(grads),)

    unet.defvjp(fwd, bwd)
    return unet


def unet_fused(net_params, ks: Sequence[float], lr_dim: int, hr_dim: int,
               interpret: bool = False):
    """Differentiable fused U-Net forward: (net_outs, start_gcn_outs).
    (Forward and backward both as kernels — the backward kernel currently
    crashes the TPU compile service; prefer unet_fused_fwdonly.)"""
    leaves, treedef = jax.tree_util.tree_flatten(net_params)
    fn = _make_unet_fused(tuple(ks), lr_dim, hr_dim, bool(interpret),
                          (treedef,))
    return fn(leaves)


@functools.lru_cache(maxsize=8)
def _make_unet_fwdonly(ks: tuple, lr_dim: int, hr_dim: int,
                       interpret: bool, treedef_container: tuple):
    """Fused U-Net FORWARD kernel with an XLA backward over the same
    bf16x3 pure function (custom_vjp). The backward rematerializes; both
    sides evaluate the identical bf16x3 decomposition, so any fwd/bwd
    inconsistency is confined to accumulation-order rounding (~1e-7),
    which can matter only at exact top-k score ties."""
    (treedef,) = treedef_container
    n_leaves = treedef.num_leaves

    def flat_unet(leaves):
        p = jax.tree_util.tree_unflatten(treedef, leaves)
        return unet_forward_rankselect(p, ks, lr_dim)

    def fwd_kernel(*refs):
        leaf_refs, out_refs = refs[:n_leaves], refs[n_leaves:]
        # 1-D leaves (biases) arrive reshaped to (1, n) — see below;
        # no genuine weight matrix has a leading dim of 1, so unwrap those
        leaves = [r[0] if (len(r.shape) == 2 and r.shape[0] == 1)
                  else r[:] for r in leaf_refs]
        net, start = flat_unet(leaves)
        out_refs[0][:] = net
        out_refs[1][:] = start

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = (jax.ShapeDtypeStruct((lr_dim, hr_dim), jnp.float32),) * 2

    @jax.custom_vjp
    def unet(leaves):
        # reshape 1-D leaves to (1, n): keeps every kernel operand >= 2-D
        # so vmap-over-folds (which prepends a mapped axis) still satisfies
        # Mosaic's trailing-two-dims block constraints
        staged = [l[None, :] if l.ndim == 1 else l for l in leaves]
        return pl.pallas_call(
            fwd_kernel, in_specs=[vmem] * n_leaves,
            out_specs=(vmem, vmem), out_shape=out_shape,
            interpret=interpret)(*staged)

    def fwd(leaves):
        return unet(leaves), tuple(leaves)

    def bwd(leaves, cts):
        _, vjp = jax.vjp(flat_unet, list(leaves))
        (grads,) = vjp(cts)
        return (grads,)

    unet.defvjp(fwd, bwd)
    return unet


def unet_fused_fwdonly(net_params, ks: Sequence[float], lr_dim: int,
                       hr_dim: int, interpret: bool = False):
    """Differentiable U-Net with a fused forward kernel + XLA backward."""
    leaves, treedef = jax.tree_util.tree_flatten(net_params)
    fn = _make_unet_fwdonly(tuple(ks), lr_dim, hr_dim, bool(interpret),
                            (treedef,))
    return fn(leaves)


@functools.lru_cache(maxsize=8)
def _build_step_kernel(ks: Sequence[float], lr_dim: int, hr_dim: int,
                       hidden_dim: int, lmbda: float, interpret: bool,
                       treedef_container: tuple):
    """Build the fused value-and-grad program for a given (static) config.
    ``treedef_container`` wraps the params treedef (hashable)."""
    (treedef,) = treedef_container

    def flat_loss(leaves, u_lr, u_hr, hr):
        params = jax.tree_util.tree_unflatten(treedef, leaves)
        return step_loss_pure(params, None, hr, u_lr, u_hr, ks, lr_dim,
                              lmbda)

    def kernel(*refs):
        n_leaves = treedef.num_leaves
        leaf_refs = refs[:n_leaves]
        ulr_ref, uhr_ref, hr_ref = refs[n_leaves:n_leaves + 3]
        out_refs = refs[n_leaves + 3:]
        loss_ref, recon_ref = out_refs[0], out_refs[1]
        grad_refs = out_refs[2:]

        leaves = [r[:] for r in leaf_refs]
        (loss, recon), grads = jax.value_and_grad(
            flat_loss, has_aux=True)(leaves, ulr_ref[:], uhr_ref[:],
                                     hr_ref[:])
        loss_ref[0, 0] = loss
        recon_ref[0, 0] = recon
        for g_ref, g in zip(grad_refs, grads):
            g_ref[:] = g

    return kernel


def step_value_and_grad_fused(params, u_lr, u_hr, hr,
                              ks: Sequence[float], lr_dim: int,
                              hr_dim: int, hidden_dim: int, lmbda: float,
                              interpret: bool = False):
    """(loss, recon, grads_pytree) with the whole step in one kernel."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    kernel = _build_step_kernel(tuple(ks), lr_dim, hr_dim, hidden_dim,
                                float(lmbda), bool(interpret), (treedef,))
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    n = len(leaves)
    out = pl.pallas_call(
        kernel,
        in_specs=[vmem] * (n + 3),
        out_specs=tuple([smem, smem] + [vmem] * n),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((1, 1), jnp.float32)] * 2
            + [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves]),
        interpret=interpret,
    )(*leaves, u_lr, u_hr, hr)
    loss, recon = out[0][0, 0], out[1][0, 0]
    grads = jax.tree_util.tree_unflatten(treedef, list(out[2:]))
    return loss, recon, grads
