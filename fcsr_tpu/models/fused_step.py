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

STATUS (v5e, 2026-08, round 3): the pure rank-select formulation is
bit-exact vs the gather/top_k model under XLA (max grad diff 0.0,
tested). Compile-service status by kernel:

* U-Net forward kernel and the hand-written residual-based U-Net
  backward kernel (``unet_fused_fwdbwd``): compile and run — the
  3-kernels/step path together with the tail kernel (9.11 s steady
  under f32-class matmuls; the library default fused configuration).
* Whole-step SINGLE kernel with hand-written adjoints
  (``gsr_step_loss_fused``, cfg.fused_step): COMPILES and runs as of
  round 3 (the hand-written backward keeps the jaxpr small enough).
  Under the f32-class compensated matmuls it is ~4% slower than the
  3-kernel split (9.46 s vs 9.11 s steady — in-kernel-MXU-bound, not
  launch-bound); under FCSR_MM_MODE=bf16 the MXU share shrinks and the
  merge wins (7.30 s vs 7.39 s). The bench runs the Adam-inclusive
  successor (cfg.fused_adam, ``train_step_fused``) + bf16: 4.73 s.
* The AD-generated joint kernel (``step_value_and_grad_fused``, which
  rematerializes the U-Net inside the backward) — RESOLVED in round 3:
  the historical "HTTP 500 compile-service crash" surfaces on the
  current toolchain as a scoped-VMEM overflow (19.4 MB vs the 16 MB
  default budget); with the raised per-kernel cap it compiles and runs
  correctly (loss exact, max grad diff 1.7e-8 vs XLA —
  tools/repro_fused_step.py), though its first compile is ~490 s vs
  seconds for the hand-written-adjoint kernels, so it stays a
  validation artifact, not a production path.
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

# error-compensated matmul for in-kernel use (see core/mosaic_mm.py for
# why DEFAULT-precision Mosaic dots need manual compensation)
from fcsr_tpu.core.mosaic_mm import mm as _mm

__all__ = ["step_loss_pure", "step_value_and_grad_fused",
           "unet_forward_rankselect", "unet_fused", "unet_fused_fwdonly",
           "unet_fused_fwdbwd", "gsr_step_loss_fused", "train_step_fused"]


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
    # one forward implementation: stage the flax subtree into the
    # name->array dicts _unet_fwd_math consumes (bit-identical ops) and
    # discard its residuals — a second hand-maintained copy of the
    # forward math is exactly how silent path divergence starts
    sizes = pool_sizes(lr_dim, ks)
    L = len(ks)
    w = {name: net_params[name]["proj"]["kernel"]
         for name in _lin_names(L)}
    b = {name: net_params[name]["proj"]["bias"][None, :]
         for name in _lin_names(L)}
    net_outs, start_outs = _unet_fwd_math(w, b, lr_dim, sizes, L)[:2]
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
    rematerializes the forward and runs jax.vjp in-kernel). Historical:
    its AD-rematerializing bwd kernel is the slow-compile variant (the
    "compile-service crash" was root-caused to a scoped-VMEM overflow,
    see module STATUS); production paths use unet_fused_fwdonly or the
    hand-written-adjoint unet_fused_fwdbwd instead."""
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


# ---------------------------------------------------------------------------
# Fused U-Net forward AND hand-written backward kernels (residual-based).
#
# The in-kernel ``jax.vjp`` backward (unet_fused above) rematerializes the
# whole forward inside the gradient kernel, which makes its jaxpr ~3x the
# forward's and crashes the TPU compile service. The backward below is
# instead written out by hand against residuals SAVED by the forward kernel
# (each level's pre-pool features, scores, selection matrices and unpool
# inputs), so its jaxpr is the same size class as the forward's — and it
# compiles. Gradients are the standard transposed-matmul adjoints evaluated
# with the same bf16x3 compensated matmul as the forward; they agree with
# ``jax.grad`` of the pure function to float-reassociation level (~1e-6
# relative, tested), the same accuracy class as the bf16x3 forward itself.
# ---------------------------------------------------------------------------


def _lin_names(n_levels: int):
    """Kernel operand order for the U-Net's 15 linear modules."""
    return (["start_gcn"]
            + [f"down_gcns_{i}" for i in range(n_levels)]
            + [f"pools_{i}" for i in range(n_levels)]
            + ["bottom_gcn"]
            + [f"up_gcns_{i}" for i in range(n_levels)]
            + ["end_gcn"])

def _unet_leaf_shapes(lr_dim: int, hr_dim: int, L: int, tail: bool = False):
    """Kernel-leaf ShapeDtypeStructs in _lin_names order — kernels (end
    split into a/b halves) then staged (1, n) biases; ``tail=True``
    appends the spectral tail's (w_gsr, w1, w2) leaves. This is the ONE
    source of truth for the fused kernels' leaf order; the shape-
    coincident (hr_dim, hr_dim) entries make a reorder undetectable at
    trace time, so train/fast_loop.py's tree_to_leaves/leaves_to_tree
    must mirror exactly this list."""
    f32 = jnp.float32
    sds = jax.ShapeDtypeStruct
    kernel_shapes = (
        [sds((lr_dim, hr_dim), f32)]                           # start
        + [sds((hr_dim, hr_dim), f32) for _ in range(L)]       # down
        + [sds((hr_dim, 1), f32) for _ in range(L)]            # pool
        + [sds((hr_dim, hr_dim), f32)]                         # bottom
        + [sds((hr_dim, hr_dim), f32) for _ in range(L)]       # up
        + [sds((hr_dim, hr_dim), f32)] * 2)                    # end a/b
    bias_shapes = (
        [sds((1, hr_dim), f32)]                                # start
        + [sds((1, hr_dim), f32) for _ in range(L)]            # down
        + [sds((1, 1), f32) for _ in range(L)]                 # pool
        + [sds((1, hr_dim), f32)]                              # bottom
        + [sds((1, hr_dim), f32) for _ in range(L)]            # up
        + [sds((1, hr_dim), f32)])                             # end
    shapes = kernel_shapes + bias_shapes
    if tail:
        shapes += [sds((hr_dim, lr_dim), f32),                 # d w_gsr
                   sds((hr_dim, hr_dim), f32),                 # d w1
                   sds((hr_dim, hr_dim), f32)]                 # d w2
    return shapes



def _unet_fwd_math(w, b, lr_dim: int, sizes, L: int):
    """U-Net forward on VALUES (shared by the fwd kernel and the
    whole-step kernel). ``w``/``b`` are name->array dicts (biases staged
    (1, n)). Returns (net, x0, d, s, P, pooled, xu, xf, pre, kscol)
    where the lists are per-level residuals exactly as the backward
    consumes them (``pre``/``kscol`` — the pre-gate pooled features and
    gate columns — let a single-kernel backward skip recomputing them)."""
    f32 = jnp.float32

    def lin(name, x):
        return _mm(x, w[name]) + b[name]

    x = lin("start_gcn", jnp.eye(lr_dim, dtype=f32))
    x0 = x
    d = [None] * L
    s = [None] * L
    P = [None] * L
    pooled = [None] * L
    pre = [None] * L
    kscol = [None] * L
    for i in range(L):
        di = lin(f"down_gcns_{i}", x)
        d[i] = di
        n_i = di.shape[0]
        # bias add via an explicit ones-matmul: its adjoint is a matmul,
        # sidestepping Mosaic's unsupported tiny odd-size lane reductions
        ones_col = jnp.ones((n_i, 1), dtype=f32)
        logits = (_mm(di, w[f"pools_{i}"])
                  + _mm(ones_col, b[f"pools_{i}"]))
        si = jax.nn.sigmoid(logits[:, 0] / 100.0)
        s[i] = si[:, None]
        P[i] = _topk_projection(si, sizes[i])
        ks_col = _mm(P[i], s[i])
        kscol[i] = ks_col
        pre[i] = _mm(P[i], di)
        x = pre[i] * ks_col
        pooled[i] = x

    x = lin("bottom_gcn", x)
    xu = [None] * L
    for i in range(L):
        up = L - i - 1
        xu_v = _mm(P[up].T, x)
        xu[up] = xu_v
        x = lin(f"up_gcns_{i}", xu_v)
        x = x + d[up]
    xf = x
    cat = jnp.concatenate([x, x0], axis=1)
    net = lin("end_gcn", cat)
    return net, x0, d, s, P, pooled, xu, xf, pre, kscol


def _unet_bwd_math(wa_end, wb_end, w_bot, w_down, w_up, w_pool,
                   x0, d, s, P, pooled, xu, xf, ct_net, ct_start,
                   L: int, hr_dim: int, pre_list=None, ks_list=None):
    """Hand-written U-Net adjoints on VALUES against the forward's
    residuals (shared by the bwd kernel and the whole-step kernel).
    Returns the grads in _lin_names order: kernels (end split into
    a/b halves) then biases. The single-kernel callers pass the
    forward's in-register ``pre``/``kscol`` residuals so the backward
    skips recomputing them; the two-kernel path (which stores only the
    gated ``pooled``) leaves them None and recomputes — identical
    values either way."""
    f32 = jnp.float32

    def colsum(g):
        return _mm(jnp.ones((1, g.shape[0]), dtype=f32), g)

    # end_gcn: net = _mm(xf, Wa) + _mm(x0, Wb) + b_end
    dwa_end = _mm(xf.T, ct_net)
    dwb_end = _mm(x0.T, ct_net)
    db_end = colsum(ct_net)
    g_x = _mm(ct_net, wa_end.T)
    g_org = _mm(ct_net, wb_end.T)

    # up chain (reverse of forward's i = 0..L-1, up = L-1-i)
    dw_up, db_up = [None] * L, [None] * L
    g_skip = [None] * L
    g = g_x
    for i in reversed(range(L)):
        up = L - i - 1
        g_skip[up] = g
        dw_up[i] = _mm(xu[up].T, g)
        db_up[i] = colsum(g)
        g_xu = _mm(g, w_up[i].T)
        g = _mm(P[up], g_xu)

    # bottom_gcn: b_out = lin(bottom, pooled_{L-1})
    dw_bot = _mm(pooled[L - 1].T, g)
    db_bot = colsum(g)
    g_p = _mm(g, w_bot.T)

    # down/pool chain backwards
    dw_down, db_down = [None] * L, [None] * L
    dw_pool, db_pool = [None] * L, [None] * L
    for i in reversed(range(L)):
        proj = P[i]
        dd = d[i]
        s_col = s[i]
        pre = _mm(proj, dd) if pre_list is None else pre_list[i]
        ks_col = _mm(proj, s_col) if ks_list is None else ks_list[i]
        g_pre = g_p * ks_col
        g_ks = _mm(g_p * pre, jnp.ones((hr_dim, 1), dtype=f32))
        g_d = _mm(proj.T, g_pre)
        g_s = _mm(proj.T, g_ks)
        g_logits = g_s * s_col * (1.0 - s_col) * (1.0 / 100.0)
        dw_pool[i] = _mm(dd.T, g_logits)
        db_pool[i] = colsum(g_logits)
        g_d = g_d + _mm(g_logits, w_pool[i].T) + g_skip[i]
        x_in = x0 if i == 0 else pooled[i - 1]
        dw_down[i] = _mm(x_in.T, g_d)
        db_down[i] = colsum(g_d)
        g_p = _mm(g_d, w_down[i].T)

    # start_gcn: input is the identity, so dW = ct directly
    g_x0 = g_p + g_org + ct_start
    dw_start = g_x0
    db_start = colsum(g_x0)

    return ([dw_start] + dw_down + dw_pool + [dw_bot] + dw_up
            + [dwa_end, dwb_end]
            + [db_start] + db_down + db_pool + [db_bot] + db_up
            + [db_end])


@functools.lru_cache(maxsize=8)
def _make_unet_fwdbwd(ks: tuple, lr_dim: int, hr_dim: int, interpret: bool):
    """Build the (fwd kernel with residual outputs, bwd kernel) pair for a
    static config. Operands are passed by NAME ORDER (_lin_names), kernels
    then biases, so no treedef is needed inside the kernels."""
    sizes = pool_sizes(lr_dim, ks)
    L = len(ks)
    names = _lin_names(L)
    pre_sizes = (lr_dim,) + sizes[:-1]  # node count entering each level
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    f32 = jnp.float32

    # ---- forward kernel: net, start, residuals --------------------------
    def fwd_kernel(*refs):
        w = {n: refs[j][:] for j, n in enumerate(names)}
        b = {n: refs[len(names) + j][:] for j, n in enumerate(names)}
        outs = refs[2 * len(names):]
        (net_ref, start_ref) = outs[0], outs[1]
        d_refs = outs[2:2 + L]
        s_refs = outs[2 + L:2 + 2 * L]
        p_refs = outs[2 + 2 * L:2 + 3 * L]
        pool_refs = outs[2 + 3 * L:2 + 4 * L]
        xu_refs = outs[2 + 4 * L:2 + 5 * L]
        xf_ref = outs[2 + 5 * L]

        net, x0, d, s, P, pooled, xu, xf, _, _ = _unet_fwd_math(
            w, b, lr_dim, sizes, L)
        net_ref[:] = net
        start_ref[:] = x0
        for i in range(L):
            d_refs[i][:] = d[i]
            s_refs[i][:] = s[i]
            p_refs[i][:] = P[i]
            pool_refs[i][:] = pooled[i]
            xu_refs[i][:] = xu[i]
        xf_ref[:] = xf

    fwd_out_shapes = (
        [jax.ShapeDtypeStruct((lr_dim, hr_dim), f32)] * 2          # net, x0
        + [jax.ShapeDtypeStruct((pre_sizes[i], hr_dim), f32)       # d_i
           for i in range(L)]
        + [jax.ShapeDtypeStruct((pre_sizes[i], 1), f32)            # s_i
           for i in range(L)]
        + [jax.ShapeDtypeStruct((sizes[i], pre_sizes[i]), f32)     # P_i
           for i in range(L)]
        + [jax.ShapeDtypeStruct((sizes[i], hr_dim), f32)           # pooled_i
           for i in range(L)]
        + [jax.ShapeDtypeStruct((pre_sizes[i], hr_dim), f32)       # xu_i
           for i in range(L)]
        + [jax.ShapeDtypeStruct((lr_dim, hr_dim), f32)])           # x_final

    # ---- backward kernel: hand-written adjoints over the residuals ------
    # inputs: Wa_end, Wb_end (end kernel pre-split outside the kernel — a
    # static lane-dim slice at hr_dim is not 128-aligned for Mosaic),
    # W_bottom, W_down_i x L, W_up_i x L, Wp_i x L, then residuals
    # (x0, d_i, s_i, P_i, pooled_i, xu_i, x_final), then ct_net, ct_start.
    # outputs: dWa_end, dWb_end, db_end, dW/db for bottom/down/up/pool,
    # dW/db for start.
    def bwd_kernel(*refs):
        k = 0

        def take(n):
            nonlocal k
            out = refs[k:k + n]
            k += n
            return out

        (wa_end,), (wb_end,), (w_bot,) = take(1), take(1), take(1)
        w_down = take(L)
        w_up = take(L)
        w_pool = take(L)
        (x0_ref,) = take(1)
        d_refs = take(L)
        s_refs = take(L)
        p_refs = take(L)
        pool_refs = take(L)
        xu_refs = take(L)
        (xf_ref,) = take(1)
        (ct_net_ref,) = take(1)
        (ct_start_ref,) = take(1)
        outs = refs[k:]

        grads = _unet_bwd_math(
            wa_end[:], wb_end[:], w_bot[:],
            [r[:] for r in w_down], [r[:] for r in w_up],
            [r[:] for r in w_pool],
            x0_ref[:], [r[:] for r in d_refs], [r[:] for r in s_refs],
            [r[:] for r in p_refs], [r[:] for r in pool_refs],
            [r[:] for r in xu_refs], xf_ref[:],
            ct_net_ref[:], ct_start_ref[:], L, hr_dim)
        for ref, gval in zip(outs, grads):
            ref[:] = gval

    def bwd_out_shapes():
        return tuple(_unet_leaf_shapes(lr_dim, hr_dim, L))

    def pack(net_params):
        """params dict -> (kernels list, staged biases list) in name order."""
        ws = [net_params[n]["proj"]["kernel"] for n in names]
        bs = [net_params[n]["proj"]["bias"][None, :] for n in names]
        return ws, bs

    @jax.custom_vjp
    def unet(net_params):
        ws, bs = pack(net_params)
        outs = pl.pallas_call(
            fwd_kernel, in_specs=[vmem] * (2 * len(names)),
            out_specs=tuple([vmem] * len(fwd_out_shapes)),
            out_shape=tuple(fwd_out_shapes),
            interpret=interpret)(*ws, *bs)
        return outs[0], outs[1]

    def fwd(net_params):
        ws, bs = pack(net_params)
        outs = pl.pallas_call(
            fwd_kernel, in_specs=[vmem] * (2 * len(names)),
            out_specs=tuple([vmem] * len(fwd_out_shapes)),
            out_shape=tuple(fwd_out_shapes),
            interpret=interpret)(*ws, *bs)
        net, x0 = outs[0], outs[1]
        residuals = outs[1:]  # x0, d, s, P, pooled, xu, x_final
        w_end = net_params["end_gcn"]["proj"]["kernel"]
        w_in = ([w_end[:hr_dim], w_end[hr_dim:],
                 net_params["bottom_gcn"]["proj"]["kernel"]]
                + [net_params[f"down_gcns_{i}"]["proj"]["kernel"]
                   for i in range(L)]
                + [net_params[f"up_gcns_{i}"]["proj"]["kernel"]
                   for i in range(L)]
                + [net_params[f"pools_{i}"]["proj"]["kernel"]
                   for i in range(L)])
        return (net, x0), (tuple(w_in), residuals)

    def bwd(saved, cts):
        w_in, residuals = saved
        ct_net, ct_start = cts
        n_in = len(w_in) + len(residuals) + 2
        outs = pl.pallas_call(
            bwd_kernel, in_specs=[vmem] * n_in,
            out_specs=tuple([vmem] * len(bwd_out_shapes())),
            out_shape=bwd_out_shapes(),
            interpret=interpret)(*w_in, *residuals, ct_net, ct_start)
        n_mod = len(names)
        dws, dbs = list(outs[:n_mod + 1]), list(outs[n_mod + 1:])
        dw_end = jnp.concatenate([dws[n_mod - 1], dws[n_mod]], axis=0)
        dws = dws[:n_mod - 1] + [dw_end]
        grads = {}
        for j, n in enumerate(names):
            grads[n] = {"proj": {"kernel": dws[j],
                                 "bias": dbs[j][0]}}
        return (grads,)

    unet.defvjp(fwd, bwd)
    return unet


def unet_fused_fwdbwd(net_params, ks: Sequence[float], lr_dim: int,
                      hr_dim: int, interpret: bool = False):
    """Differentiable fused U-Net whose forward AND backward each run as
    one Mosaic kernel (hand-written residual-based adjoints — see the
    section comment above). Returns (net_outs, start_gcn_outs)."""
    fn = _make_unet_fwdbwd(tuple(ks), lr_dim, hr_dim, bool(interpret))
    return fn(net_params)


# ---------------------------------------------------------------------------
# Whole-step SINGLE kernel: U-Net forward + fused tail (value+grad via
# in-kernel AD) + hand-written U-Net adjoints, all in one Mosaic kernel.
#
# This is the hand-written-adjoint successor of step_value_and_grad_fused
# (whose in-kernel jax.value_and_grad over the ENTIRE step rematerializes
# the U-Net inside the backward and crashes the TPU compile service). Here
# the backward is the residual-based _unet_bwd_math — the same code the
# two-kernel path runs — so the joint jaxpr is fwd + tail-AD + bwd with no
# rematerialization. One kernel launch per training step replaces three
# (U-Net fwd, tail, U-Net bwd), and every residual stays in VMEM instead
# of round-tripping HBM between kernels.
#
# Exposed as a custom_vjp scalar loss (same residual-trick as
# fused_tail.tail_loss_fused): forward computes value AND all grads;
# backward scales the stored grads by the upstream cotangent. The `recon`
# aux output is treated as non-differentiable (the trainer only consumes
# it as a metric via has_aux).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _make_step_fused_full(ks: tuple, lr_dim: int, hr_dim: int,
                          lmbda: float, interpret: bool):
    sizes = pool_sizes(lr_dim, ks)
    L = len(ks)
    names = _lin_names(L)
    n_mod = len(names)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    f32 = jnp.float32
    pre_sizes = (lr_dim,) + sizes[:-1]

    def kernel(*refs):
        k = 0

        def take(n):
            nonlocal k
            out = refs[k:k + n]
            k += n
            return out

        # end_gcn ships ONLY as its two halves (the backward's natural
        # operands); the forward concatenates them in-kernel — shipping
        # the full matrix too would be ~575 KB of redundant HBM->VMEM
        # traffic per step (same layout as _make_train_step_kernel)
        w_refs = take(n_mod - 1)
        (wa_ref,), (wb_ref,) = take(1), take(1)
        b_refs = take(n_mod)
        (wg_ref,), (w1_ref,), (w2_ref,) = take(1), take(1), take(1)
        (ulr_ref,), (uhr_ref,), (hr_ref,) = take(1), take(1), take(1)
        outs = refs[k:]

        w = {n: w_refs[j][:] for j, n in enumerate(names[:-1])}
        wa, wb = wa_ref[:], wb_ref[:]
        w["end_gcn"] = jnp.concatenate([wa, wb], axis=0)
        b = {n: b_refs[j][:] for j, n in enumerate(names)}
        net, x0, d, s, P, pooled, xu, xf, pre_l, ks_l = _unet_fwd_math(
            w, b, lr_dim, sizes, L)

        (tail, recon), (g_wg, g_w1, g_w2, g_f) = jax.value_and_grad(
            _tail_loss, argnums=(0, 1, 2, 3), has_aux=True)(
            wg_ref[:], w1_ref[:], w2_ref[:], net, ulr_ref[:], uhr_ref[:],
            hr_ref[:])

        # lmbda * L1(net, start) term: value and exact sign adjoints
        diff = net - x0
        loss = lmbda * jnp.mean(jnp.abs(diff)) + tail
        g_l1 = jnp.sign(diff) * (lmbda / diff.size)
        ct_net = g_f + g_l1
        ct_start = -g_l1

        grads = _unet_bwd_math(
            wa, wb, w["bottom_gcn"],
            [w[f"down_gcns_{i}"] for i in range(L)],
            [w[f"up_gcns_{i}"] for i in range(L)],
            [w[f"pools_{i}"] for i in range(L)],
            x0, d, s, P, pooled, xu, xf, ct_net, ct_start, L, hr_dim,
            pre_list=pre_l, ks_list=ks_l)

        outs[0][0, 0] = loss
        outs[1][0, 0] = recon
        for ref, gval in zip(outs[2:], grads + [g_wg, g_w1, g_w2]):
            ref[:] = gval

    def out_shapes():
        return tuple([jax.ShapeDtypeStruct((1, 1), f32)] * 2
                     + _unet_leaf_shapes(lr_dim, hr_dim, L, tail=True))

    def pack(net_params):
        # end_gcn ships only as its halves (concatenated in-kernel)
        ws = [net_params[n]["proj"]["kernel"] for n in names[:-1]]
        bs = [net_params[n]["proj"]["bias"][None, :] for n in names]
        w_end = net_params["end_gcn"]["proj"]["kernel"]
        return ws, [w_end[:hr_dim], w_end[hr_dim:]], bs

    shapes = out_shapes()

    def run(net_params, w_gsr, w1, w2, u_lr, u_hr, hr):
        ws, (wa, wb), bs = pack(net_params)
        n_in = 2 * n_mod + 1 + 6
        outs = pl.pallas_call(
            kernel, in_specs=[vmem] * n_in,
            out_specs=tuple([smem, smem] + [vmem] * (len(shapes) - 2)),
            out_shape=shapes,
            interpret=interpret)(*ws, wa, wb, *bs, w_gsr, w1, w2,
                                 u_lr, u_hr, hr)
        loss, recon = outs[0][0, 0], outs[1][0, 0]
        dws, rest = list(outs[2:2 + n_mod + 1]), list(outs[3 + n_mod:])
        dbs, tail_grads = rest[:n_mod], rest[n_mod:]
        dw_end = jnp.concatenate([dws[n_mod - 1], dws[n_mod]], axis=0)
        dws = dws[:n_mod - 1] + [dw_end]
        net_grads = {n: {"proj": {"kernel": dws[j], "bias": dbs[j][0]}}
                     for j, n in enumerate(names)}
        return loss, recon, net_grads, tail_grads

    @jax.custom_vjp
    def step(net_params, w_gsr, w1, w2, u_lr, u_hr, hr):
        loss, recon, _, _ = run(net_params, w_gsr, w1, w2, u_lr, u_hr, hr)
        return loss, recon

    def fwd(net_params, w_gsr, w1, w2, u_lr, u_hr, hr):
        loss, recon, net_grads, (g_wg, g_w1, g_w2) = run(
            net_params, w_gsr, w1, w2, u_lr, u_hr, hr)
        return (loss, recon), (net_grads, g_wg, g_w1, g_w2)

    def bwd(saved, cts):
        net_grads, g_wg, g_w1, g_w2 = saved
        ct_loss, _ = cts  # recon aux is non-differentiable by contract
        scale = lambda g: jax.tree_util.tree_map(lambda x: ct_loss * x, g)
        return (scale(net_grads), ct_loss * g_wg, ct_loss * g_w1,
                ct_loss * g_w2, None, None, None)

    step.defvjp(fwd, bwd)
    return step


def gsr_step_loss_fused(net_params, w_gsr, w1, w2, u_lr, u_hr, hr,
                        ks: Sequence[float], lr_dim: int, hr_dim: int,
                        lmbda: float, interpret: bool = False):
    """(loss, recon) for the FULL GSR training step — U-Net, spectral
    tail, decoder and all three loss terms — computed (value and all
    gradients) in ONE Mosaic kernel. Differentiable in (net_params,
    w_gsr, w1, w2); u_lr/u_hr/hr are data. ``recon`` is a
    non-differentiable metric aux."""
    fn = _make_step_fused_full(tuple(ks), lr_dim, hr_dim, float(lmbda),
                               bool(interpret))
    loss, recon = fn(net_params, w_gsr, w1, w2, u_lr, u_hr, hr)
    # make the "recon is a metric, not a loss term" contract visible to
    # JAX: the custom_vjp discards recon's cotangent, so a caller who
    # differentiates a recon-weighted objective must see the standard
    # stop_gradient semantics rather than a silent drop inside bwd
    return loss, jax.lax.stop_gradient(recon)


# ---------------------------------------------------------------------------
# Whole TRAINING STEP kernel: forward + backward + Adam update in ONE
# Mosaic kernel.
#
# With the whole-step kernel (above) the remaining per-step HBM traffic is
# the flat-Adam marshalling: unravel slices feeding the kernel (~24 MB/step
# over 3 folds), the grad-leaf concat back into the flat vector (~24 MB)
# and the separate Adam elementwise pass (~84 MB). Doing the Adam update
# per leaf INSIDE the kernel is elementwise-identical math (Adam is
# pointwise, so adam(concat(leaves)) == concat(adam(leaf)) exactly) and
# cuts the traffic to one read + one write of (p, m, v): the kernel takes
# the parameter/moment leaves and emits the UPDATED leaves, plus the step
# loss/recon scalars. Masked no-op steps (fold padding) are handled
# in-kernel via the ok flag. The trainer carries the state as leaf trees
# between steps and converts flat <-> tree only at chunk boundaries.
#
# STATUS (v5e, 2026-08): bit-exact vs the fused_step path (tested on
# CPU; identical val MAE on hardware) and the FASTEST path measured:
# 4.72 s steady under FCSR_MM_MODE=bf16 (vs 7.28 s for fused_step) —
# eliminating the flat-Adam marshalling traffic is worth ~115 us/step.
# One hardware note: the kernel's I/O working set (p + m + v in AND
# out, ~64 MB over 3 vmapped folds) exceeds the compiler's DEFAULT
# 16 MB scoped-VMEM budget ("Ran out of memory in memory space vmem…
# 63.58M and limit 16.00M"); the pallas_call therefore raises the cap
# via CompilerParams(vmem_limit_bytes=112 MB) — v5e has 128 MB physical
# VMEM, so the compiler simply needs permission to use it.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _make_train_step_kernel(ks: tuple, lr_dim: int, hr_dim: int,
                            lmbda: float, lr: float, b1: float, b2: float,
                            eps: float, interpret: bool):
    sizes = pool_sizes(lr_dim, ks)
    L = len(ks)
    names = _lin_names(L)
    n_mod = len(names)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    f32 = jnp.float32
    # leaf order: 16 weight mats (end pre-split) + 15 biases + tail 3
    n_leaves = (n_mod + 1) + n_mod + 3

    def kernel(*refs):
        k = 0

        def take(n):
            nonlocal k
            out = refs[k:k + n]
            k += n
            return out

        p_refs = take(n_leaves)
        m_refs = take(n_leaves)
        v_refs = take(n_leaves)
        (ulr_ref,), (uhr_ref,), (hr_ref,) = take(1), take(1), take(1)
        (sc_ref,) = take(1)  # SMEM scalars (1, 3): [okf, d1, d2]
        outs = refs[k:]

        w_refs = p_refs[:n_mod]
        wa_ref, wb_ref = p_refs[n_mod - 1], p_refs[n_mod]
        b_refs = p_refs[n_mod + 1:2 * n_mod + 1]
        wg_ref, w1_ref, w2_ref = p_refs[2 * n_mod + 1:]

        # forward (full end weight = concat of the split halves, exactly
        # the math of the two-kernel path's single _mm over the concat)
        w = {n: w_refs[j][:] for j, n in enumerate(names[:-1])}
        w["end_gcn"] = jnp.concatenate([wa_ref[:], wb_ref[:]], axis=0)
        b = {n: b_refs[j][:] for j, n in enumerate(names)}
        net, x0, d, s, P, pooled, xu, xf, pre_l, ks_l = _unet_fwd_math(
            w, b, lr_dim, sizes, L)

        (tail, recon), (g_wg, g_w1, g_w2, g_f) = jax.value_and_grad(
            _tail_loss, argnums=(0, 1, 2, 3), has_aux=True)(
            wg_ref[:], w1_ref[:], w2_ref[:], net, ulr_ref[:], uhr_ref[:],
            hr_ref[:])

        diff = net - x0
        loss = lmbda * jnp.mean(jnp.abs(diff)) + tail
        g_l1 = jnp.sign(diff) * (lmbda / diff.size)
        ct_net = g_f + g_l1
        ct_start = -g_l1

        grads = _unet_bwd_math(
            wa_ref[:], wb_ref[:], w["bottom_gcn"],
            [w[f"down_gcns_{i}"] for i in range(L)],
            [w[f"up_gcns_{i}"] for i in range(L)],
            [w[f"pools_{i}"] for i in range(L)],
            x0, d, s, P, pooled, xu, xf, ct_net, ct_start, L, hr_dim,
            pre_list=pre_l, ks_list=ks_l)
        # grads order: 16 weight mats + 15 biases (from _unet_bwd_math),
        # then the tail grads — matches the p_refs leaf order
        grads = grads + [g_wg, g_w1, g_w2]

        okf = sc_ref[0, 0]
        d1 = sc_ref[0, 1]
        d2 = sc_ref[0, 2]
        outs[0][0, 0] = loss * okf
        outs[1][0, 0] = recon * okf
        p_outs = outs[2:2 + n_leaves]
        m_outs = outs[2 + n_leaves:2 + 2 * n_leaves]
        v_outs = outs[2 + 2 * n_leaves:]
        for j in range(n_leaves):
            # bias leaves are staged (1, n); grads for them come back
            # (1, n) from colsum — shapes already agree
            g = grads[j]
            p_v = p_refs[j][:]
            m_v = m_refs[j][:]
            v_v = v_refs[j][:]
            m_new = b1 * m_v + (1.0 - b1) * g
            v_new = b2 * v_v + (1.0 - b2) * (g * g)
            mhat = m_new / d1
            vhat = v_new / d2
            step = lr * mhat / (jnp.sqrt(vhat) + eps)
            p_outs[j][:] = p_v - okf * step
            m_outs[j][:] = jnp.where(okf > 0, m_new, m_v)
            v_outs[j][:] = jnp.where(okf > 0, v_new, v_v)

    def leaf_shapes():
        return _unet_leaf_shapes(lr_dim, hr_dim, L, tail=True)

    shapes = leaf_shapes()
    out_shapes = tuple([jax.ShapeDtypeStruct((1, 1), f32)] * 2
                       + shapes * 3)

    def run(p_leaves, m_leaves, v_leaves, u_lr, u_hr, hr, scalars):
        """scalars: (1, 3) f32 [[okf, d1, d2]]. Leaves in kernel order
        (16 weight mats with end split, 15 staged biases, tail 3).
        Returns (loss, recon, p', m', v') with leaves in the same order."""
        outs = pl.pallas_call(
            kernel,
            in_specs=[vmem] * (3 * n_leaves + 3) + [smem],
            out_specs=tuple([smem, smem] + [vmem] * (3 * n_leaves)),
            out_shape=out_shapes,
            interpret=interpret,
            # p+m+v in/out exceed the default 16 MB scoped-VMEM budget;
            # v5e has 128 MB physical VMEM — raise the cap for this kernel
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024),
        )(*p_leaves, *m_leaves, *v_leaves, u_lr, u_hr, hr, scalars)
        loss, recon = outs[0][0, 0], outs[1][0, 0]
        p_new = list(outs[2:2 + n_leaves])
        m_new = list(outs[2 + n_leaves:2 + 2 * n_leaves])
        v_new = list(outs[2 + 2 * n_leaves:])
        return loss, recon, p_new, m_new, v_new

    return run


def train_step_fused(p_leaves, m_leaves, v_leaves, u_lr, u_hr, hr,
                     scalars, ks: Sequence[float], lr_dim: int,
                     hr_dim: int, lmbda: float, lr: float,
                     b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                     interpret: bool = False):
    """One full GSR training step — forward, backward AND the (masked)
    Adam update — as ONE Mosaic kernel. See the section comment above.
    ``scalars`` = f32 (3,) [ok_flag, 1-b1^t, 1-b2^t]."""
    fn = _make_train_step_kernel(tuple(ks), lr_dim, hr_dim, float(lmbda),
                                 float(lr), float(b1), float(b2),
                                 float(eps), bool(interpret))
    return fn(p_leaves, m_leaves, v_leaves, u_lr, u_hr, hr, scalars)


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
        # full-dim working set slightly exceeds the default 16 MB scoped
        # VMEM budget (measured 19.4 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
    )(*leaves, u_lr, u_hr, hr)
    loss, recon = out[0][0, 0], out[1][0, 0]
    grads = jax.tree_util.tree_unflatten(treedef, list(out[2:]))
    return loss, recon, grads
