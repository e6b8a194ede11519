"""GSR-Net: Graph U-Net encoder + spectral super-resolution + GCN decoder.

TPU-native re-design of the reference's centerpiece model
(ref: models/gsr_model.py, models/layers.py, models/ops.py):

  * All pooling sizes are STATIC, computed once from the pooling ratios
    (``max(1, int(round(k * n)))``, ref: models/ops.py:42) so ``lax.top_k``
    and gathers keep fixed shapes under jit.
  * The eigendecomposition of the normalized LR adjacency
    (ref: models/layers.py:27) is of *data*, not parameters — callers may
    precompute it batched and pass ``u_lr``; no gradient flows into it
    either way, so hoisting it out of the train loop is exact.
  * In-place torch idioms (``fill_diagonal_``, boolean-mask assignment,
    ref: models/layers.py:56,62 / models/gsr_model.py:34-35) become
    functional ``where`` updates.
  * The whole forward is one dense-matmul program; a batch of connectomes is
    processed with ``jax.vmap`` (the reference runs one 160x160 matrix per
    forward, ref: utils/gsr_train.py:23).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fcsr_tpu.core.normalize import fill_diagonal, normalize_adj, symmetrize

__all__ = ["GSRLayer", "GraphConvolution", "GCN", "GraphPool", "GraphUnpool",
           "GraphUnet", "GSRNet", "pool_sizes"]


def pool_sizes(n: int, ks: Sequence[float]) -> Tuple[int, ...]:
    """Static node counts after each pooling level.

    Uses Python's banker's rounding exactly like the reference's
    ``int(round(k * num_nodes))`` (ref: models/ops.py:42); for the shipped
    config n=160, ks=(0.9, 0.7, 0.6, 0.5) this yields (144, 101, 61, 30).
    """
    sizes = []
    for k in ks:
        n = max(1, int(round(k * n)))
        sizes.append(n)
    return tuple(sizes)


def torch_linear_init(in_features: int):
    """Weight/bias initializers distributionally matching torch.nn.Linear's
    default (uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both)."""
    bound = 1.0 / (in_features ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class GCN(nn.Module):
    """The reference Graph-U-Net 'GCN' block is a Linear layer only — it
    receives A but ignores it (ref: models/ops.py:50-61). Kept faithfully;
    dropout there is p=0 so it is omitted."""
    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, adj, x):
        del adj  # faithful to the reference: adjacency unused
        dense = nn.Dense(self.out_dim,
                         kernel_init=torch_linear_init(self.in_dim),
                         bias_init=torch_linear_init(self.in_dim),
                         name="proj")
        return dense(x)


class GraphPool(nn.Module):
    """Top-k node pooling with a learned score
    (ref: models/ops.py:26-48). ``k_out`` is the static kept-node count."""
    k_out: int
    in_dim: int

    @nn.compact
    def __call__(self, adj, x):
        proj = nn.Dense(1, kernel_init=torch_linear_init(self.in_dim),
                        bias_init=torch_linear_init(self.in_dim),
                        name="proj")
        scores = jax.nn.sigmoid(jnp.squeeze(proj(x), -1) / 100.0)
        values, idx = jax.lax.top_k(scores, self.k_out)
        new_x = x[idx, :] * values[:, None]
        new_adj = adj[idx, :][:, idx]
        return new_adj, new_x, idx


class GraphUnpool(nn.Module):
    """Scatter pooled features back to their pre-pool node slots
    (ref: models/ops.py:7-24)."""

    @nn.compact
    def __call__(self, adj, x, idx):
        new_x = jnp.zeros((adj.shape[0], x.shape[1]), dtype=x.dtype)
        new_x = new_x.at[idx].set(x)
        return adj, new_x


class GraphUnet(nn.Module):
    """Dense Graph U-Net over one connectome
    (ref: models/ops.py:63-115): start GCN -> (down GCN + pool) x L ->
    bottom GCN -> (unpool + up GCN + skip-add) x L -> concat with the
    start-GCN output -> end GCN."""
    ks: Sequence[float]
    in_dim: int
    out_dim: int
    dim: int = 268

    def setup(self):
        self.start_gcn = GCN(self.in_dim, self.dim)
        self.bottom_gcn = GCN(self.dim, self.dim)
        self.end_gcn = GCN(2 * self.dim, self.out_dim)
        sizes = pool_sizes(self.in_dim, self.ks)
        self.down_gcns = [GCN(self.dim, self.dim) for _ in self.ks]
        self.up_gcns = [GCN(self.dim, self.dim) for _ in self.ks]
        self.pools = [GraphPool(sizes[i], self.dim)
                      for i in range(len(self.ks))]
        self.unpools = [GraphUnpool() for _ in self.ks]

    def __call__(self, adj, x):
        adj_ms = []
        indices_list = []
        down_outs = []

        x = self.start_gcn(adj, x)
        start_gcn_outs = x
        org_x = x

        for i in range(len(self.ks)):
            x = self.down_gcns[i](adj, x)
            adj_ms.append(adj)
            down_outs.append(x)
            adj, x, idx = self.pools[i](adj, x)
            indices_list.append(idx)

        x = self.bottom_gcn(adj, x)

        for i in range(len(self.ks)):
            up_idx = len(self.ks) - i - 1
            adj, idx = adj_ms[up_idx], indices_list[up_idx]
            adj, x = self.unpools[i](adj, x, idx)
            x = self.up_gcns[i](adj, x)
            x = x + down_outs[up_idx]

        x = jnp.concatenate([x, org_x], axis=1)
        x = self.end_gcn(adj, x)
        return x, start_gcn_outs


class GSRLayer(nn.Module):
    """Spectral super-resolution layer (ref: models/layers.py:11-63).

    Projects a learnable (hr_dim, lr_dim) weight through the LR adjacency's
    eigenbasis to build the HR adjacency. ``u_lr`` (eigenvectors of the
    normalized LR adjacency) may be passed in precomputed; it depends only
    on the input data, so batched precomputation outside the train loop is
    exact, unlike the reference which re-decomposes every step.
    """
    hr_dim: int
    lr_dim: int

    @nn.compact
    def __call__(self, adj_lr, x, u_lr: Optional[jax.Array] = None):
        weights = self.param("weights", nn.initializers.normal(stddev=1.0),
                             (self.hr_dim, self.lr_dim))
        if u_lr is None:
            _, u_lr = jnp.linalg.eigh(adj_lr)

        # The reference builds this via a duplicated-identity selector and
        # zero-padded eigenvector/feature matrices (models/layers.py:34-54):
        #   a = W @ s_d.T;  b = a @ pad(U).T;  f_d = |b @ pad(f)|.
        # All the padded blocks are zero, so the chain collapses EXACTLY
        # (only zero summands are dropped) to two small matmuls:
        #   b_small = W @ U.T          (hr, lr) @ (lr, lr)
        #   f_d     = |b_small @ f|    (hr, lr) @ (lr, feat)
        b_small = jnp.matmul(weights, u_lr.T,
                             preferred_element_type=jnp.float32)
        x_lr = x[: self.lr_dim]  # (the reference pads rows with zeros that
        # b's zero columns would multiply; slicing is the exact equivalent)
        f_d = jnp.abs(jnp.matmul(b_small, x_lr,
                                 preferred_element_type=jnp.float32))
        f_d = fill_diagonal(f_d, 1.0)

        adj = normalize_adj(f_d)
        x_out = jnp.matmul(adj, adj.T, preferred_element_type=jnp.float32)
        x_out = symmetrize(x_out)
        x_out = fill_diagonal(x_out, 1.0)
        return adj, jnp.abs(x_out)


class GraphConvolution(nn.Module):
    """Dense GCN layer ``adj @ (x @ W)`` with Xavier-uniform init
    (ref: models/layers.py:66-88); its dropout/activation are disabled in
    the reference's forward and therefore omitted."""
    in_features: int
    out_features: int

    @nn.compact
    def __call__(self, x, adj):
        weight = self.param("weight", nn.initializers.xavier_uniform(),
                            (self.in_features, self.out_features))
        support = jnp.matmul(x, weight, preferred_element_type=jnp.float32)
        return jnp.matmul(adj, support, preferred_element_type=jnp.float32)


class GSRNet(nn.Module):
    """Full GSR-Net (ref: models/gsr_model.py:10-37).

    __call__ takes one LR adjacency (lr_dim, lr_dim); use ``jax.vmap`` over
    a stacked batch. Returns (prediction, net_outs, start_gcn_outs,
    layer_outs) exactly mirroring the reference's output tuple.
    """
    ks: Sequence[float] = (0.9, 0.7, 0.6, 0.5)
    lr_dim: int = 160
    hr_dim: int = 268
    hidden_dim: int = 268

    def setup(self):
        self.layer = GSRLayer(self.hr_dim, self.lr_dim)
        # The reference hardcodes the U-Net width to 268 (models/ops.py:64),
        # which equals hr_dim in its shipped config; the GSR composite loss
        # compares net_outs (width out_dim) against start_gcn_outs (width
        # dim), so the two must be equal — tie them explicitly.
        self.net = GraphUnet(self.ks, self.lr_dim, self.hr_dim,
                             dim=self.hr_dim)
        self.gc1 = GraphConvolution(self.hr_dim, self.hidden_dim)
        self.gc2 = GraphConvolution(self.hidden_dim, self.hr_dim)

    def __call__(self, lr, u_lr: Optional[jax.Array] = None,
                 a_norm: Optional[jax.Array] = None):
        eye = jnp.eye(self.lr_dim, dtype=lr.dtype)
        # a_norm (= normalize_adj(lr)) is pure data; pipelines precompute
        # it batched and pass it in to keep it out of the training step
        adj = normalize_adj(lr) if a_norm is None else a_norm

        net_outs, start_gcn_outs = self.net(adj, eye)
        outputs, z = self.layer(adj, net_outs, u_lr=u_lr)
        hidden1 = self.gc1(z, outputs)
        hidden2 = self.gc2(hidden1, outputs)

        z = symmetrize(hidden2)
        z = fill_diagonal(z, 1.0)
        return jnp.abs(z), net_outs, start_gcn_outs, outputs
