"""Differentiable graph metrics + GSRLoss (ref: utils/metrics.py).

These are the reference's cheap, differentiable centrality approximations
used for auxiliary losses — distinct from the NetworkX-faithful evaluation
kernels in centrality.py. All are pure jnp, batched via vmap, and
gradient-safe (fixed iteration counts, no data-dependent control flow).
"""

from __future__ import annotations

import jax.numpy as jnp

from fcsr_tpu.train.losses import l1

__all__ = ["betweenness_approx", "eigenvector_power", "pagerank_diff",
           "gsr_loss", "evaluate_model_mae"]


def betweenness_approx(adj, num_iter: int = 10):
    """Matrix-power betweenness approximation
    (ref: utils/metrics.py:15-27): centrality_i = row-sum of (A+I)^k
    normalized by the total sum."""
    n = adj.shape[-1]
    a = adj + jnp.eye(n, dtype=adj.dtype)
    dist = jnp.linalg.matrix_power(a, num_iter)
    return dist.sum(axis=-1) / dist.sum()


def eigenvector_power(adj, num_iter: int = 100):
    """Power-iteration eigenvector centrality with L2 normalization
    (ref: utils/metrics.py:29-43)."""
    n = adj.shape[-1]
    a = adj + jnp.eye(n, dtype=adj.dtype)
    x = jnp.ones((n, 1), dtype=adj.dtype)
    for _ in range(num_iter):
        x = a @ x
        x = x / jnp.linalg.norm(x)
    return x[:, 0]


def pagerank_diff(adj, alpha: float = 0.85, num_iter: int = 100):
    """Differentiable PageRank (ref: utils/metrics.py:45-60): row-normalize
    with a 1e-9 clamp, fixed-count power iteration."""
    n = adj.shape[-1]
    a = adj / jnp.clip(adj.sum(axis=-1, keepdims=True), 1e-9, None)
    teleport = jnp.full((n,), 1.0 / n, dtype=adj.dtype)
    rank = teleport
    for _ in range(num_iter):
        rank = alpha * (a.T @ rank) + (1 - alpha) * teleport
    return rank


def gsr_loss(input_adj, target_adj):
    """GSRLoss (ref: utils/metrics.py:67-82): mean over the batch of the
    average L1 distance between {BC-approx, EC, PageRank, adjacency} of
    prediction and target. Batched inputs (B, n, n)."""
    def one(a, b):
        return (l1(betweenness_approx(a), betweenness_approx(b))
                + l1(eigenvector_power(a), eigenvector_power(b))
                + l1(pagerank_diff(a), pagerank_diff(b))
                + l1(a, b)) / 4.0

    import jax
    return jnp.mean(jax.vmap(one)(input_adj, target_adj))


def evaluate_model_mae(preds, targets):
    """Plain mean |pred - target| over stacked matrices
    (ref: utils/metrics.py:85-111)."""
    return float(jnp.mean(jnp.abs(jnp.asarray(preds)
                                  - jnp.asarray(targets))))
