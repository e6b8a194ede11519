"""MLP super-resolution baselines.

Two variants, as in the reference:

  * ``SuperResMLP`` — v1: Flatten(160^2) -> [Linear+BatchNorm+Dropout+ReLU]^n
    -> Linear(268^2) -> Unflatten (ref: models/mlp.py:6-39). Operates on the
    full dense matrix.
  * ``SpectralResMLP`` — v2: vectorized triu input (12720) -> spectral-norm
    Linear + BN + Dropout + LeakyReLU -> n residual blocks -> spectral-norm
    Linear (35778) + Sigmoid -> scatter into the HR triu mask + symmetrize
    (ref: training_template.ipynb cell-5). The shipped run uses n_layers=0,
    hidden=(160+268)//2.

Both are batched flax modules: input (B, n, n) dense adjacencies, output
(B, m, m).  Vectorization uses the row-major triu mask exactly like the
reference's boolean-mask gather.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fcsr_tpu.core.vectorize import triu_indices_rowmajor
from fcsr_tpu.models.gsr import torch_linear_init

__all__ = ["SuperResMLP", "SpectralResMLP", "TorchBatchNorm",
           "SNDense"]


class TorchBatchNorm(nn.Module):
    """BatchNorm with ``torch.nn.BatchNorm1d``'s exact running-stat
    semantics. flax's ``nn.BatchNorm`` updates the running variance with
    the BIASED batch variance; torch updates it with the UNBIASED
    estimator (x n/(n-1)) while still normalizing the batch with the
    biased one. The difference only surfaces in eval-mode forwards
    (running stats), but that is exactly where val losses — and through
    them the plateau scheduler and the best-state choice (ref:
    utils/training.py:114-145) — come from, so the reference models use
    this module for transplant-grade parity. Variable names/shapes match
    ``nn.BatchNorm`` (params: scale/bias; batch_stats: mean/var), so
    checkpoints are interchangeable."""
    momentum: float = 0.9       # running <- m*running + (1-m)*batch
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(feat, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(feat, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        if use_running_average:
            mean = jnp.asarray(ra_mean.value, x.dtype)
            var = jnp.asarray(ra_var.value, x.dtype)
        else:
            n = x.size // feat
            mean = jnp.mean(x, axis=tuple(range(x.ndim - 1)))
            var = jnp.mean(jnp.square(x), axis=tuple(
                range(x.ndim - 1))) - jnp.square(mean)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * unbiased)
        inv = jax.lax.rsqrt(var + jnp.asarray(self.epsilon, x.dtype))
        return (x - mean) * inv * scale + bias


class SNDense(nn.Module):
    """Dense layer under spectral normalization with ``torch.nn.utils.
    spectral_norm``'s EXACT semantics (ref: training_template.ipynb cell
    334b874b wraps every Linear in it).

    flax's ``nn.SpectralNorm`` stores only ``u`` and re-runs a power
    iteration from it on EVERY call — including eval — so its eval-mode
    sigma differs from torch's, which freezes the stored ``(u, v)`` pair
    and computes ``sigma = u . (W v)`` with no iteration. Before the
    estimate converges the two sigmas differ at the 1e-3 level, which
    moves every validation loss and through it the plateau scheduler and
    best-state choice (measured: 5e-3 val-loss delta on epoch 0 of the
    transplant harness). This module stores both vectors
    (batch_stats: u (out,), v (in,)) and reproduces torch bit-for-bit:

      train: v = normalize(K u); u' = normalize(K^T v);
             sigma = u' . (K^T v); store (u', v)       [K = (in, out)]
      eval:  sigma = u . (K^T v) from the STORED pair, no iteration.

    Gradients flow through K in sigma; u/v are stop-gradient buffers
    (torch detaches them identically)."""
    features: int
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x, update_stats: bool):
        in_f = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.xavier_uniform(),
                            (in_f, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        def init_vec(key, n):
            w = jax.random.normal(key, (n,), jnp.float32)
            return w / jnp.linalg.norm(w)

        u_var = self.variable("batch_stats", "u", init_vec,
                              self.make_rng("params")
                              if not self.has_variable("batch_stats", "u")
                              else None, self.features)
        v_var = self.variable("batch_stats", "v", init_vec,
                              self.make_rng("params")
                              if not self.has_variable("batch_stats", "v")
                              else None, in_f)

        def l2n(w):
            return w / jnp.maximum(jnp.linalg.norm(w), self.eps)

        k = kernel
        u0 = jnp.asarray(u_var.value, k.dtype)
        if update_stats:
            v0 = jax.lax.stop_gradient(l2n(k @ u0))
            u0 = jax.lax.stop_gradient(l2n(k.T @ v0))
        else:
            v0 = jnp.asarray(v_var.value, k.dtype)
        sigma = u0 @ (k.T @ v0)
        if update_stats and not self.is_initializing():
            u_var.value = u0
            v_var.value = v0
        return x @ (k / sigma) + bias


class SuperResMLP(nn.Module):
    """v1 dense-matrix MLP (ref: models/mlp.py)."""
    input_size: int          # e.g. 160*160
    output_size: int         # e.g. 268*268
    hidden_dim: int
    n_layers: int = 1
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = int(np.sqrt(self.output_size))
        b = x.shape[0]
        x = x.reshape(b, -1)
        widths = [self.input_size] + [self.hidden_dim] * self.n_layers
        for i in range(self.n_layers):
            x = nn.Dense(self.hidden_dim,
                         kernel_init=torch_linear_init(widths[i]),
                         bias_init=torch_linear_init(widths[i]))(x)
            x = TorchBatchNorm(momentum=0.9, epsilon=1e-5)(
                x, use_running_average=not train)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            x = nn.relu(x)
        x = nn.Dense(self.output_size,
                     kernel_init=torch_linear_init(widths[-1]),
                     bias_init=torch_linear_init(widths[-1]))(x)
        return x.reshape(b, h, h)


class SpectralResMLP(nn.Module):
    """v2 spectral-norm residual MLP on vectorized connectomes
    (ref: training_template.ipynb cell-5 SuperResMLP).

    ``output="vector"`` returns the raw (B, L_out) sigmoid vector instead
    of scattering it into symmetric matrices; the param tree is identical
    for both modes (the scatter has no params), so one set of variables
    serves both. Input may be dense (B, n, n) adjacencies or
    already-vectorized (B, L_in) rows. The TRAINING pipeline uses
    vector-in/vector-out: XLA's compile time for the backward of the wide
    (35778-dim) Dense fused with the triu gather/scatter is pathological
    on TPU (~500 s, and large variants crash the compile service — see
    PERF.md 'MLP family'), while the pure dense-chain backward compiles
    in seconds. The matrix MSE is computed equivalently in vector space
    (train/losses.py::make_triu_mse_criterion)."""
    num_nodes_input: int = 160
    num_nodes_output: int = 268
    num_hidden: int = (160 + 268) // 2
    n_layers: int = 0
    dropout: float = 0.1
    output: str = "matrix"  # "matrix" | "vector"

    @nn.compact
    def __call__(self, adj_batch, train: bool = False):
        n_in = self.num_nodes_input
        n_out = self.num_nodes_output
        rows_in, cols_in = triu_indices_rowmajor(n_in)
        rows_out, cols_out = triu_indices_rowmajor(n_out)
        b = adj_batch.shape[0]

        if adj_batch.ndim == 2:
            x = adj_batch                       # already vectorized
        else:
            x = adj_batch[:, rows_in, cols_in]  # (B, 12720)

        def sn_dense(features, name):
            # torch's spectral_norm(Linear) with xavier-uniform init
            # (the notebook applies Xavier to every Linear); SNDense
            # reproduces torch's train AND eval sigma exactly
            return SNDense(features, name=name)

        x = sn_dense(self.num_hidden, "input_dense")(
            x, update_stats=train)
        x = TorchBatchNorm(momentum=0.9, epsilon=1e-5,
                           name="input_bn")(x, use_running_average=not train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.leaky_relu(x, negative_slope=0.01)

        for i in range(self.n_layers):
            residual = x
            y = sn_dense(self.num_hidden, f"res_dense_{i}")(
                x, update_stats=train)
            y = TorchBatchNorm(momentum=0.9, epsilon=1e-5,
                               name=f"res_bn_{i}")(
                y, use_running_average=not train)
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
            y = nn.leaky_relu(y, negative_slope=0.01)
            x = y + residual
            x = nn.leaky_relu(x, negative_slope=0.01)

        x = sn_dense(len(rows_out), "output_dense")(x, update_stats=train)
        x = nn.sigmoid(x)
        if self.output == "vector":
            return x

        out = jnp.zeros((b, n_out, n_out), dtype=x.dtype)
        out = out.at[:, rows_out, cols_out].set(x)
        return out + jnp.swapaxes(out, 1, 2)
