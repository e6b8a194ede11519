"""Fused GAT U-Net training step: the ENTIRE per-sample update — dense
masked multi-head attention U-Net forward, backward (via in-kernel AD of
the pure formulation) AND the masked AdamW update — as ONE Mosaic kernel.

This is the GSR fused_adam playbook (models/fused_step.py) applied to the
GAT family (ref: unet-transformer.py:54-197,219-427):

  * **Gather-free pooling.** ``GATPool``'s ``top_k`` + gathers become the
    rank-select one-hot projection (``_topk_projection``, bit-exact
    lax.top_k semantics): ``x_p = (P @ x) * (P @ scores)``,
    ``a_p = P @ a @ P^T``; unpooling is ``P^T @ x``.
  * **Per-head 2-D attention.** PyG-semantics multi-head attention is
    expressed head-by-head with pure 2-D ops (Mosaic's vreg layout):
    lane-sliced per-head features, broadcast logit sums, a manual masked
    softmax over the existing-edge + self-loop neighborhood (the max is
    stop-gradiented exactly like ``jax.nn.softmax``).
  * **In-kernel AD + AdamW.** The kernel body calls
    ``jax.value_and_grad`` on the pure step loss and applies the masked
    per-leaf AdamW update in-kernel (elementwise — identical math to the
    flat-vector update, same argument as fused_step.train_step_fused).
  * **In-kernel dropout.** With ``drop_p > 0`` the attention/pool dropout
    masks are generated with the Mosaic PRNG (pltpu.prng_*) from a
    per-step seed operand — a different stream than the flax path, so
    trajectories are stochastically equivalent, not bitwise (the same
    contract train_gat_folds_parallel already documents); with
    ``drop_p = 0`` the math matches the unfused model exactly (up to the
    compensated-matmul accuracy class; tested).

All matmuls are PINNED to the f32-class compensated formulation
(core/mosaic_mm.mm_compensated, ignoring FCSR_MM_MODE): at GAT's tiny
per-head sizes the single-pass bf16 mode is 2.5x slower and costs
quality (PERF.md). Bias adds are ones-matmuls (their adjoints are
matmuls — Mosaic's tiny odd-size lane reductions do not lower in
backward).
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Pinned to the compensated formulation: at GAT's tiny per-head sizes
# the single-pass bf16 mode is 2.5x SLOWER (tile-relayout bound) and
# costs quality — see PERF.md "GAT-specific kernel findings".
from fcsr_tpu.core.mosaic_mm import mm_compensated as _mm
from fcsr_tpu.models.fused_step import _topk_projection
from fcsr_tpu.models.gat_unet import gat_pool_sizes

__all__ = ["gat_step_loss", "gat_train_step_fused", "gat_val_fused",
           "gat_leaves_from_tree", "gat_tree_from_leaves", "gat_dims",
           "ADAM_B1", "ADAM_B2"]

F32 = jnp.float32

# Single source of truth for the AdamW betas: the kernel's in-kernel moment
# updates AND the host/driver-side bias-correction scalars (1 - b^t, shipped
# via the ``scalars`` operand) must use the SAME values or they silently
# desynchronize. gat_train_step_fused defaults to these; callers computing
# the corrections import them from here.
ADAM_B1 = 0.9
ADAM_B2 = 0.999


def gat_dims(dim: int, ks: Sequence[float]) -> List[int]:
    """Per-level feature widths (ref: unet-transformer.py:287-293)."""
    dims = [dim]
    for k in ks:
        dims.append(int(dims[-1] / k))
    return dims


def _layer_specs(dim: int, ks: Sequence[float], heads: int):
    """(flax module name, in_dim, out_dim, heads) for every DenseGAT in
    forward order: down levels, bottom, up levels."""
    L = len(ks)
    dims = gat_dims(dim, ks)
    specs = [(f"down_gcns_{i}", dims[i], dims[i + 1], heads)
             for i in range(L)]
    specs.append(("bottom_gcn", dims[-1], dims[-1], 2))
    specs += [(f"up_gcns_{i}", dims[L - i], dims[L - i - 1], heads)
              for i in range(L)]
    return specs


def gat_leaves_from_tree(params, dim: int, ks: Sequence[float],
                         heads: int):
    """Canonical kernel leaf order: per GAT layer (w, att_src, att_dst,
    bias(1,out)), then per pool (kernel, bias(1,1)), then the upsampler
    (kernel, bias(1,m)). Biases are staged 2-D."""
    leaves = []
    for name, _, _, _ in _layer_specs(dim, ks, heads):
        p = params[name]
        leaves += [p["w"], p["att_src"], p["att_dst"], p["bias"][None, :]]
    for i in range(len(ks)):
        p = params[f"pools_{i}"]["proj"]
        leaves += [p["kernel"], p["bias"][None, :]]
    p = params["upsampler"]["upsample_mlp"]
    leaves += [p["kernel"], p["bias"][None, :]]
    return leaves


def gat_tree_from_leaves(leaves, dim: int, ks: Sequence[float],
                         heads: int):
    """Inverse of gat_leaves_from_tree."""
    specs = _layer_specs(dim, ks, heads)
    tree = {}
    k = 0
    for name, _, _, _ in specs:
        w, asrc, adst, b = leaves[k:k + 4]
        k += 4
        tree[name] = {"w": w, "att_src": asrc, "att_dst": adst,
                      "bias": b[0]}
    for i in range(len(ks)):
        pw, pb = leaves[k:k + 2]
        k += 2
        tree[f"pools_{i}"] = {"proj": {"kernel": pw, "bias": pb[0]}}
    uw, ub = leaves[k:k + 2]
    tree["upsampler"] = {"upsample_mlp": {"kernel": uw, "bias": ub[0]}}
    return tree


def _ones_col(n):
    return jnp.ones((n, 1), dtype=F32)


def _blockdiag_cols(att):
    """(heads, d) attention vectors -> (heads*d, heads) block-diagonal
    matrix: column j holds att[j] in rows [j*d, (j+1)*d). One matmul
    against the concatenated features then scores ALL heads at once;
    the zero blocks contribute exactly 0.0, so the result is bit-equal
    to the per-head products."""
    heads, d = att.shape
    cols = []
    for j in range(heads):
        pieces = []
        if j:
            pieces.append(jnp.zeros((j * d, 1), F32))
        pieces.append(att[j:j + 1, :].T)
        if heads - 1 - j:
            pieces.append(jnp.zeros(((heads - 1 - j) * d, 1), F32))
        cols.append(jnp.concatenate(pieces, axis=0) if len(pieces) > 1
                    else pieces[0])
    return jnp.concatenate(cols, axis=1) if heads > 1 else cols[0]


def _gat_layer(w, att_src, att_dst, bias_row, a, x, heads: int,
               drop_mask=None, drop_p: float = 0.0,
               batched_chain: bool = False):
    """Dense masked multi-head attention, PyG GATConv semantics
    (models/gat_unet.py::DenseGAT) in pure 2-D ops.

    ``batched_chain`` runs all heads' elementwise softmax chain as ONE
    (n, heads*n) chain (see _gat_layer_batched) — mathematically
    identical, FP-reassociation-level different (row-global softmax
    max instead of per-head)."""
    n = x.shape[0]
    d_head = w.shape[1] // heads
    h = _mm(x, w)                                     # (n, heads*d)
    # all heads' source/target attention terms in two matmuls
    s_all = _mm(h, _blockdiag_cols(att_src))          # (n, heads)
    t_all = _mm(h, _blockdiag_cols(att_dst))
    mask = (a != 0) | jnp.eye(n, dtype=bool)
    maskf = mask.astype(F32)
    if batched_chain:
        return _gat_layer_batched(h, s_all, t_all, bias_row, maskf,
                                  heads, d_head, drop_mask, drop_p)
    outs = []
    for j in range(heads):
        h_j = h[:, j * d_head:(j + 1) * d_head]
        s_j = s_all[:, j:j + 1]                       # (n, 1): source term
        t_j = t_all[:, j:j + 1]                       # (n, 1): target term
        # logits[i, jsrc] = leaky(att_src.h_jsrc + att_dst.h_i)
        logits = jnp.where(
            s_j.T + t_j >= 0, s_j.T + t_j, 0.2 * (s_j.T + t_j))
        logits = jnp.where(mask, logits, -1e30)
        # manual softmax over sources (axis=1), max stop-gradiented
        # exactly like jax.nn.softmax
        zmax = jax.lax.stop_gradient(
            jnp.max(logits, axis=1, keepdims=True))
        e = jnp.exp(logits - zmax) * maskf
        alpha = e / jnp.sum(e, axis=1, keepdims=True)
        if drop_mask is not None:
            alpha = alpha * drop_mask[j] * (1.0 / (1.0 - drop_p))
        outs.append(_mm(alpha, h_j))
    out = jnp.concatenate(outs, axis=1)
    return out + _mm(_ones_col(n), bias_row)


def _gat_layer_batched(h, s_all, t_all, bias_row, maskf, heads: int,
                       d_head: int, drop_mask, drop_p: float):
    """All heads' exp/mask/softmax elementwise chain as ONE (n, heads*n)
    chain (VERDICT r3 item 7). Broadcast terms are built with tiny
    block-indicator matmuls (Mosaic has no cheap lane-reshape):

      rep (heads, heads*n): rep[j, j*n+k] = 1
      E   (n, heads*n):     E[k', j*n+k] = (k' == k)  (tiled eye)

      T_big = t_all @ rep                   # [i, jn+k] = t_all[i, j]
      srow  = ones(1,n) @ ((s_all @ rep)*E) # [0, jn+k] = s_all[k, j]
      S_big = ones(n,1) @ srow              # [i, jn+k] = s_all[k, j]

    The softmax max is the row-global max over all heads (any per-row
    constant cancels in the per-block ratio — same argument as
    jax.nn.softmax's shift), so values match the per-head path to FP
    reassociation, not bitwise. Denominators come back through the
    same indicators: sums = e @ rep.T, D_big = sums @ rep."""
    n = maskf.shape[0]
    # indicators built in-trace from integer iota, not host np
    # constants: pallas_call rejects captured non-scalar constants
    # inside the Mosaic kernel.
    col = jax.lax.broadcasted_iota(jnp.int32, (heads, heads * n), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (heads, heads * n), 0)
    rep = (col // n == row).astype(F32)               # (heads, heads*n)
    colt = jax.lax.broadcasted_iota(jnp.int32, (n, heads * n), 1)
    rowt = jax.lax.broadcasted_iota(jnp.int32, (n, heads * n), 0)
    eye_tile = (colt % n == rowt).astype(F32)         # tiled eye
    mask_big = jnp.concatenate([maskf] * heads, axis=1)

    t_big = _mm(t_all, rep)                           # (n, heads*n)
    srow = _mm(jnp.ones((1, n), F32), _mm(s_all, rep) * eye_tile)
    s_big = _mm(_ones_col(n), srow)
    z = s_big + t_big
    z = jnp.where(z >= 0, z, 0.2 * z)
    logits = jnp.where(mask_big > 0, z, -1e30)
    zmax = jax.lax.stop_gradient(jnp.max(logits, axis=1, keepdims=True))
    e = jnp.exp(logits - zmax) * mask_big
    sums = _mm(e, rep.T)                              # (n, heads)
    alpha_big = e / _mm(sums, rep)
    if drop_mask is not None:
        keep = jnp.concatenate([drop_mask[j] for j in range(heads)],
                               axis=1)
        alpha_big = alpha_big * keep * (1.0 / (1.0 - drop_p))
    outs = [_mm(alpha_big[:, j * n:(j + 1) * n],
                h[:, j * d_head:(j + 1) * d_head])
            for j in range(heads)]
    out = jnp.concatenate(outs, axis=1)
    return out + _mm(_ones_col(n), bias_row)


def _symnorm(a, eps: float = 1e-5):
    d = jnp.sum(a, axis=-1) + eps
    r = jax.lax.rsqrt(d)
    return a * r[None, :] * r[:, None]


def _offdiag_mse(p, t):
    n = p.shape[0]
    off = 1.0 - jnp.eye(n, dtype=F32)
    d = (p - t) * off
    return jnp.sum(d * d) / (n * n)


def gat_step_loss(leaves, a0, x0, hr, *, dim: int, ks: Sequence[float],
                  n_nodes: int, m_nodes: int, heads: int,
                  intermediate_losses: bool = True, drop_p: float = 0.0,
                  drop_masks=None, batched_chain: bool = False,
                  return_pred: bool = False):
    """The full GAT U-Net training loss as a pure function of the
    canonical leaf list (no gathers, no SVD — everything Mosaic can
    lower). ``a0`` is the normalized (A + I) adjacency (data — staged
    outside, identical to what the model computes in-forward);
    ``drop_masks`` (optional) is the dict of pre-drawn keep masks."""
    L = len(ks)
    sizes = gat_pool_sizes(n_nodes, ks)
    specs = _layer_specs(dim, ks, heads)
    lv = {name: leaves[4 * j:4 * j + 4]
          for j, (name, _, _, _) in enumerate(specs)}
    k = 4 * len(specs)
    pools = [leaves[k + 2 * i:k + 2 * i + 2] for i in range(L)]
    uw, ub = leaves[k + 2 * L:k + 2 * L + 2]

    def dm(name):
        return None if drop_masks is None else drop_masks.get(name)

    a = a0
    x = x0
    a_hist, P_list = [], []
    for i in range(L):
        w, asrc, adst, b = lv[f"down_gcns_{i}"]
        x = jax.nn.relu(_gat_layer(w, asrc, adst, b, a, x, heads,
                                   dm(f"att_down_{i}"), drop_p,
                                   batched_chain))
        a_hist.append(a)
        # pool: scores from (dropped) x, rank-select projection
        z = x
        pm = dm(f"pool_{i}")
        if pm is not None:
            z = x * pm[0] * (1.0 / (1.0 - drop_p))
        pw, pb = pools[i]
        scores_col = jax.nn.sigmoid(_mm(z, pw)
                                    + _mm(_ones_col(z.shape[0]), pb))
        P = _topk_projection(scores_col[:, 0], sizes[i])
        P_list.append(P)
        x = _mm(P, x) * _mm(P, scores_col)
        a = _symnorm(_mm(_mm(P, a), P.T))

    w, asrc, adst, b = lv["bottom_gcn"]
    x = jax.nn.relu(_gat_layer(w, asrc, adst, b, a, x, 2,
                               dm("att_bottom"), drop_p, batched_chain))

    recon = []
    for i in range(L):
        up = L - i - 1
        x = _mm(P_list[up].T, x)                       # unpool
        w, asrc, adst, b = lv[f"up_gcns_{i}"]
        x = jax.nn.relu(_gat_layer(w, asrc, adst, b, a_hist[up], x,
                                   heads, dm(f"att_up_{i}"), drop_p,
                                   batched_chain))
        recon.append(jax.nn.relu(_mm(x, x.T)))

    # upsampler: Dense(m) on X^T, row-softmax over features, relu(Y Y^T).
    # Kept in (feat, m) layout: softmax over axis=0 == the model's
    # axis=1 softmax of the transposed matrix.
    y = _mm(x.T, uw) + _mm(_ones_col(x.shape[1]), ub)  # (feat, m)
    zmax = jax.lax.stop_gradient(jnp.max(y, axis=0, keepdims=True))
    e = jnp.exp(y - zmax)
    q = e / jnp.sum(e, axis=0, keepdims=True)
    pred = jax.nn.relu(_mm(q.T, q))                    # (m, m)

    loss = _offdiag_mse(pred, hr)
    if intermediate_losses:
        # zip(a_hist, reversed(recon)) — ref: unet-transformer.py:468-474
        for l in range(L):
            loss = loss + _offdiag_mse(a_hist[l], recon[L - 1 - l])
    if return_pred:
        return loss, pred
    return loss


def _mask_shapes(dim: int, ks: Sequence[float], n_nodes: int, heads: int):
    """(name, per-head count, (rows, cols)) of every dropout mask, in the
    order the step consumes them."""
    L = len(ks)
    dims = gat_dims(dim, ks)
    sizes = (n_nodes,) + gat_pool_sizes(n_nodes, ks)
    shapes = []
    for i in range(L):
        shapes.append((f"att_down_{i}", heads, (sizes[i], sizes[i])))
        shapes.append((f"pool_{i}", 1, (sizes[i], dims[i + 1])))
    shapes.append(("att_bottom", 2, (sizes[L], sizes[L])))
    for i in range(L):
        up = L - i - 1
        shapes.append((f"att_up_{i}", heads, (sizes[up], sizes[up])))
    return shapes


def _bits_to_keep_mask(bits, drop_p):
    """SIGNED int32 PRNG words -> f32 keep mask ~ Bernoulli(1 - drop_p).

    bits is SIGNED int32: a plain ``bits >> 8`` is an arithmetic shift,
    mapping half the stream to negative u — which made ``u >= drop_p``
    keep only ~49% at any small drop_p (a real round-3 ship). Mask to
    the low 24 bits after a logical shift instead: u is then uniform in
    [0, 1). This is THE production transform — the CI binomial test
    (tests/test_fused_gat.py) exercises this function, not a re-typed
    copy."""
    u24 = jax.lax.shift_right_logical(bits, 8) & 0xFFFFFF
    u = u24.astype(F32) * (1.0 / (1 << 24))
    return (u >= drop_p).astype(F32)


def _draw_masks(dim, ks, n_nodes, heads, drop_p, bits_fn=None):
    """In-kernel dropout masks from the Mosaic PRNG (seeded by the
    caller; ``bits_fn`` overrides the bit source — the interpret path
    substitutes a threefry stream since pltpu.prng_* has no CPU
    lowering). keep ~ Bernoulli(1 - p) as uniform >= p.

    Every entry is a LIST of per-head (rows, cols) masks, even for
    count == 1 — a bare array would make ``drop_mask[j]`` silently index
    ROW j instead of head j in the heads==1 attention path."""
    if bits_fn is None:
        bits_fn = pltpu.prng_random_bits
    masks = {}
    for name, count, shape in _mask_shapes(dim, ks, n_nodes, heads):
        ms = []
        for _ in range(count):
            ms.append(_bits_to_keep_mask(bits_fn(shape), drop_p))
        masks[name] = ms
    return masks


@functools.lru_cache(maxsize=8)
def _make_gat_train_kernel(dim: int, ks: tuple, n_nodes: int,
                           m_nodes: int, heads: int, intermediate: bool,
                           drop_p: float, b1: float, b2: float,
                           eps: float, wd: float, interpret: bool,
                           batched_chain: bool):
    specs = _layer_specs(dim, ks, heads)
    L = len(ks)
    n_leaves = 4 * len(specs) + 2 * L + 2
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

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
        (a_ref,), (x_ref,), (hr_ref,) = take(1), take(1), take(1)
        (sc_ref,) = take(1)   # SMEM f32 (1, 4): [ok, lr, d1, d2]
        (seed_ref,) = take(1)  # SMEM i32 (1, 2)
        outs = refs[k:]

        masks = None
        if drop_p > 0:
            if interpret:
                # pltpu.prng_* has no CPU interpret lowering; draw the
                # SAME downstream transform from a threefry stream
                # seeded from the same per-step seeds (stochastically
                # equivalent masks — CI runs the full dropout placement
                # and 1/(1-p) scaling through this path)
                key_box = [jax.random.fold_in(
                    jax.random.PRNGKey(seed_ref[0, 0]),
                    seed_ref[0, 1])]

                def bits_fn(shape):
                    key_box[0], sub = jax.random.split(key_box[0])
                    return jax.lax.bitcast_convert_type(
                        jax.random.bits(sub, shape, jnp.uint32),
                        jnp.int32)

                masks = _draw_masks(dim, ks, n_nodes, heads, drop_p,
                                    bits_fn=bits_fn)
            else:
                pltpu.prng_seed(seed_ref[0, 0], seed_ref[0, 1])
                masks = _draw_masks(dim, ks, n_nodes, heads, drop_p)

        p_leaves = [r[:] for r in p_refs]

        def loss_fn(leaves):
            return gat_step_loss(
                leaves, a_ref[:], x_ref[:], hr_ref[:], dim=dim, ks=ks,
                n_nodes=n_nodes, m_nodes=m_nodes, heads=heads,
                intermediate_losses=intermediate, drop_p=drop_p,
                drop_masks=masks, batched_chain=batched_chain)

        loss, grads = jax.value_and_grad(loss_fn)(p_leaves)

        okf = sc_ref[0, 0]
        lr = sc_ref[0, 1]
        d1 = sc_ref[0, 2]
        d2 = sc_ref[0, 3]
        outs[0][0, 0] = loss
        p_outs = outs[1:1 + n_leaves]
        m_outs = outs[1 + n_leaves:1 + 2 * n_leaves]
        v_outs = outs[1 + 2 * n_leaves:]
        for j in range(n_leaves):
            g = grads[j]
            p_v = p_leaves[j]
            m_v = m_refs[j][:]
            v_v = v_refs[j][:]
            m_new = b1 * m_v + (1.0 - b1) * g
            v_new = b2 * v_v + (1.0 - b2) * (g * g)
            mhat = m_new / d1
            vhat = v_new / d2
            # optax.adamw: decoupled weight decay folded into the step
            step = lr * (mhat / (jnp.sqrt(vhat) + eps) + wd * p_v)
            p_outs[j][:] = p_v - okf * step
            m_outs[j][:] = jnp.where(okf > 0, m_new, m_v)
            v_outs[j][:] = jnp.where(okf > 0, v_new, v_v)

    def leaf_shapes():
        # widths are h * d_head (= heads * (out_d // heads)), matching the
        # flax params exactly — NOT out_d, which differs whenever a level
        # width is not divisible by its head count
        shapes = []
        for _, in_d, out_d, h in specs:
            d_head = out_d // h
            shapes += [jax.ShapeDtypeStruct((in_d, h * d_head), F32),
                       jax.ShapeDtypeStruct((h, d_head), F32),
                       jax.ShapeDtypeStruct((h, d_head), F32),
                       jax.ShapeDtypeStruct((1, h * d_head), F32)]
        dims = gat_dims(dim, ks)
        for i in range(L):
            shapes += [jax.ShapeDtypeStruct((dims[i + 1], 1), F32),
                       jax.ShapeDtypeStruct((1, 1), F32)]
        shapes += [jax.ShapeDtypeStruct((n_nodes, m_nodes), F32),
                   jax.ShapeDtypeStruct((1, m_nodes), F32)]
        return shapes

    shapes = leaf_shapes()
    out_shapes = tuple([jax.ShapeDtypeStruct((1, 1), F32)] + shapes * 3)

    def run(p_leaves, m_leaves, v_leaves, a0, x0, hr, scalars, seeds):
        outs = pl.pallas_call(
            kernel,
            in_specs=[vmem] * (3 * n_leaves + 3) + [smem, smem],
            out_specs=tuple([smem] + [vmem] * (3 * n_leaves)),
            out_shape=out_shapes,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024),
        )(*p_leaves, *m_leaves, *v_leaves, a0, x0, hr, scalars, seeds)
        loss = outs[0][0, 0]
        p_new = list(outs[1:1 + n_leaves])
        m_new = list(outs[1 + n_leaves:1 + 2 * n_leaves])
        v_new = list(outs[1 + 2 * n_leaves:])
        return loss, p_new, m_new, v_new

    return run


@functools.lru_cache(maxsize=8)
def _make_gat_val_kernel(dim: int, ks: tuple, n_nodes: int, m_nodes: int,
                         heads: int, intermediate: bool, interpret: bool,
                         batched_chain: bool):
    specs = _layer_specs(dim, ks, heads)
    L = len(ks)
    n_leaves = 4 * len(specs) + 2 * L + 2
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def kernel(*refs):
        p_refs = refs[:n_leaves]
        a_ref, x_ref, hr_ref, out_ref = refs[n_leaves:]
        leaves = [r[:] for r in p_refs]
        loss, pred = gat_step_loss(
            leaves, a_ref[:], x_ref[:], hr_ref[:], dim=dim, ks=ks,
            n_nodes=n_nodes, m_nodes=m_nodes, heads=heads,
            intermediate_losses=intermediate, drop_p=0.0,
            drop_masks=None, batched_chain=batched_chain,
            return_pred=True)
        hr = hr_ref[:]
        # off-diagonal mask from iota (pallas rejects captured consts);
        # mean over ALL m*m entries with the diagonal zeroed — exactly
        # the unfused val's jnp.mean(|pred*off - hr*off|)
        ii = jax.lax.broadcasted_iota(jnp.int32, (m_nodes, m_nodes), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (m_nodes, m_nodes), 1)
        off = (ii != jj).astype(F32)
        mae = jnp.sum(jnp.abs(pred * off - hr * off)) / (m_nodes * m_nodes)
        out_ref[0, 0] = loss
        out_ref[0, 1] = mae

    def run(p_leaves, a0, x0, hr):
        out = pl.pallas_call(
            kernel,
            in_specs=[vmem] * (n_leaves + 3),
            out_specs=smem,
            out_shape=jax.ShapeDtypeStruct((1, 2), F32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024),
        )(*p_leaves, a0, x0, hr)
        return out[0, 0], out[0, 1]

    return run


def gat_val_fused(p_leaves, a0, x0, hr, *, dim: int, ks: Sequence[float],
                  n_nodes: int, m_nodes: int, heads: int,
                  intermediate_losses: bool = True,
                  interpret: bool = False, batched_chain: bool = False):
    """One validation forward (loss + off-diagonal MAE) as ONE Mosaic
    kernel — the eval-side twin of gat_train_step_fused (dropout off,
    no grads). The unfused per-subject flax forward dominates the
    trainer's per-epoch marginal cost once training steps are fused
    (tools/experiments/gat_trainer_breakdown.py); this collapses the
    ~170 tiny ops per subject into one kernel launch. Returns
    ``(loss, mae)`` — loss exactly the training objective at
    train=False (ref: unet-transformer.py:149-195 computes val loss
    with the same criterion), mae the off-diagonal mean absolute error
    the reports quote."""
    fn = _make_gat_val_kernel(int(dim), tuple(ks), int(n_nodes),
                              int(m_nodes), int(heads),
                              bool(intermediate_losses), bool(interpret),
                              bool(batched_chain))
    return fn(p_leaves, a0, x0, hr)


def gat_train_step_fused(p_leaves, m_leaves, v_leaves, a0, x0, hr,
                         scalars, seeds, *, dim: int, ks: Sequence[float],
                         n_nodes: int, m_nodes: int, heads: int,
                         intermediate_losses: bool = True,
                         drop_p: float = 0.0, b1: float = ADAM_B1,
                         b2: float = ADAM_B2, eps: float = 1e-8,
                         wd: float = 0.01, interpret: bool = False,
                         batched_chain: bool = False):
    """One full GAT training step (fwd + bwd + masked AdamW) as ONE
    Mosaic kernel. ``scalars`` = f32 (1, 4) [[ok, lr, 1-b1^t, 1-b2^t]];
    ``seeds`` = int32 (1, 2) PRNG seed for the in-kernel dropout (unused
    when drop_p == 0). Returns (loss, p', m', v') in canonical leaf
    order (gat_leaves_from_tree). ``batched_chain`` switches the
    per-head softmax elementwise chains to the single (n, heads*n)
    formulation (_gat_layer_batched)."""
    for name, _, out_d, h in _layer_specs(int(dim), tuple(ks), int(heads)):
        if out_d % h:
            raise ValueError(
                f"GAT level '{name}' has width {out_d} not divisible by "
                f"its head count {h}; pick dim/ks so every level width "
                f"int(dim/k...) is a multiple of heads (and the bottom "
                f"width a multiple of 2)")
    fn = _make_gat_train_kernel(int(dim), tuple(ks), int(n_nodes),
                                int(m_nodes), int(heads),
                                bool(intermediate_losses), float(drop_p),
                                float(b1), float(b2), float(eps),
                                float(wd), bool(interpret),
                                bool(batched_chain))
    return fn(p_leaves, m_leaves, v_leaves, a0, x0, hr, scalars, seeds)
