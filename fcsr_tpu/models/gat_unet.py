"""GAT Graph-U-Net + learned upsampler ("unet-transformer" model family).

TPU-native re-design of the reference's PyG-based model
(ref: unet-transformer.py:219-427):

  * PyG's sparse ``GATConv`` (with a dense->sparse conversion EVERY call,
    ref: unet-transformer.py:377) becomes dense masked multi-head attention
    with an additive -inf mask where no edge exists — same math, one fused
    MXU-friendly program, no scatter.
  * Node features are the top-``dim`` left singular vectors of the
    normalized adjacency (ref: unet-transformer.py:313-317); they depend
    only on data, so callers precompute them batched outside the train loop.
  * Pool keeps ``max(2, int(k * n))`` nodes (truncation, NOT banker's
    rounding — this family differs from GSR's pooling on purpose,
    ref: unet-transformer.py:413) and re-normalizes the pooled adjacency.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fcsr_tpu.core.normalize import symmetric_normalize

__all__ = ["DenseGAT", "GATPool", "GATUnpool", "GraphUpsampler",
           "GATGraphUnet", "gat_pool_sizes", "svd_node_features",
           "reconstruct_adjacency"]


def gat_pool_sizes(n: int, ks: Sequence[float]) -> Tuple[int, ...]:
    """max(2, int(k*n)) per level (ref: unet-transformer.py:413)."""
    sizes = []
    for k in ks:
        n = max(2, int(k * n))
        sizes.append(n)
    return tuple(sizes)


def svd_node_features(a_norm, dim: int):
    """Top-``dim`` left singular vectors of the (normalized) adjacency —
    the reference's node-feature builder (ref: unet-transformer.py:313-317).
    Batched over a leading axis; pure data, precompute outside training."""
    u, _, _ = jnp.linalg.svd(a_norm)
    return u[..., :, :dim]


def reconstruct_adjacency(x):
    """relu(X X^T) (ref: unet-transformer.py:201-216)."""
    return nn.relu(jnp.matmul(x, jnp.swapaxes(x, -1, -2),
                              preferred_element_type=jnp.float32))


class DenseGAT(nn.Module):
    """Dense masked multi-head GAT layer, PyG GATConv semantics
    (glorot-init W and attention vectors, LeakyReLU(0.2) logits, softmax
    over the existing-edge + self-loop neighborhood, attention dropout,
    concatenated heads + bias)."""
    in_dim: int
    out_dim: int            # total output dim (heads * per-head)
    heads: int = 4
    dropout: float = 0.0
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, adj, x, train: bool = False):
        n = adj.shape[0]
        d_head = self.out_dim // self.heads
        w = self.param("w", nn.initializers.xavier_uniform(),
                       (self.in_dim, self.heads * d_head))
        att_src = self.param("att_src", nn.initializers.xavier_uniform(),
                             (self.heads, d_head))
        att_dst = self.param("att_dst", nn.initializers.xavier_uniform(),
                             (self.heads, d_head))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.heads * d_head,))

        h = jnp.matmul(x, w, preferred_element_type=jnp.float32)
        h = h.reshape(n, self.heads, d_head)
        # PyG: alpha_ij = leakyrelu(att_src . h_j + att_dst . h_i),
        # softmax over source nodes j for each target i
        a_src = jnp.einsum("nhd,hd->nh", h, att_src)
        a_dst = jnp.einsum("nhd,hd->nh", h, att_dst)
        logits = a_src[None, :, :] + a_dst[:, None, :]  # (i, j, heads)
        logits = nn.leaky_relu(logits, negative_slope=self.negative_slope)

        # neighborhood: existing edges plus (re-added) self-loops
        # (GATConv(add_self_loops=True) removes then re-adds self edges)
        mask = (adj != 0) | jnp.eye(n, dtype=bool)
        logits = jnp.where(mask[:, :, None], logits, -jnp.inf)
        alpha = jax.nn.softmax(logits, axis=1)
        alpha = jnp.where(mask[:, :, None], alpha, 0.0)
        if self.dropout > 0:
            alpha = nn.Dropout(self.dropout, deterministic=not train)(alpha)
        out = jnp.einsum("ijh,jhd->ihd", alpha, h)
        return out.reshape(n, self.heads * d_head) + bias


class GATPool(nn.Module):
    """Learned top-k pool, dropout on scores' input, pooled adjacency
    re-normalized (ref: unet-transformer.py:384-397,411-427)."""
    k_out: int
    in_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, adj, x, train: bool = False):
        z = nn.Dropout(self.dropout, deterministic=not train)(x)
        proj = nn.Dense(1, kernel_init=nn.initializers.xavier_uniform(),
                        name="proj")
        scores = jax.nn.sigmoid(jnp.squeeze(proj(z), -1))
        values, idx = jax.lax.top_k(scores, self.k_out)
        x_p = x[idx, :] * values[:, None]
        a_p = adj[idx, :][:, idx]
        a_p = symmetric_normalize(a_p)
        return a_p, x_p, idx


class GATUnpool(nn.Module):
    """Scatter back to pre-pool slots (ref: unet-transformer.py:400-408)."""

    @nn.compact
    def __call__(self, adj, x, idx):
        new_x = jnp.zeros((adj.shape[0], x.shape[1]), dtype=x.dtype)
        return adj, new_x.at[idx].set(x)


class GraphUpsampler(nn.Module):
    """Linear(n->m) on X^T + row softmax + relu(XX^T)
    (ref: unet-transformer.py:219-261)."""
    n_nodes: int
    m_nodes: int

    @nn.compact
    def __call__(self, x):
        up = nn.Dense(self.m_nodes,
                      kernel_init=nn.initializers.xavier_uniform(),
                      name="upsample_mlp")
        x_up = up(x.T).T                      # (m_nodes, feat)
        x_up = jax.nn.softmax(x_up, axis=1)
        return reconstruct_adjacency(x_up)


class GATGraphUnet(nn.Module):
    """Full GAT U-Net (ref: unet-transformer.py:264-363).

    __call__ takes ONE raw (n, n) adjacency; normalization + self-loops
    happen inside (ref:324-325). ``x`` (SVD features) may be precomputed.
    Returns (a_upsampled, a_history, a_recon_history).
    """
    ks: Sequence[float] = (0.5, 0.5, 0.5)
    n_nodes: int = 160
    m_nodes: int = 268
    dim: int = 16
    heads: int = 4
    drop_p: float = 0.01
    # NOTE: the reference's skip branch (unet-transformer.py:354-359) is
    # latently shape-broken for its shipped config — per-level feature
    # dims grow as int(dim/k), so X.add(down_outs[...]) mismatches unless
    # all ks == 1; the shipped run uses skip=False. Same constraint here.
    skip: bool = False

    def setup(self):
        dims = [self.dim]
        for k in self.ks:
            dims.append(int(dims[-1] / k))
        sizes = gat_pool_sizes(self.n_nodes, self.ks)
        self.down_gcns = [DenseGAT(dims[i], dims[i + 1], heads=self.heads,
                                   dropout=self.drop_p)
                          for i in range(len(self.ks))]
        # up path runs in reverse level order (the reference reverses the
        # ModuleList, ref: unet-transformer.py:293)
        self.up_gcns = [DenseGAT(dims[len(self.ks) - i],
                                 dims[len(self.ks) - i - 1],
                                 heads=self.heads, dropout=self.drop_p)
                        for i in range(len(self.ks))]
        self.pools = [GATPool(sizes[i], dims[i + 1], dropout=self.drop_p)
                      for i in range(len(self.ks))]
        self.unpools = [GATUnpool() for _ in self.ks]
        # the reference's bottom GT receives drop_p too
        # (ref: unet-transformer.py:296 GT(dim, dim, act, drop_p), heads=2)
        self.bottom_gcn = DenseGAT(dims[-1], dims[-1], heads=2,
                                   dropout=self.drop_p)
        self.upsampler = GraphUpsampler(self.n_nodes, self.m_nodes)

    def __call__(self, a_raw, x: Optional[jax.Array] = None,
                 train: bool = False):
        n = a_raw.shape[0]
        a = a_raw + jnp.eye(n, dtype=a_raw.dtype)
        a = symmetric_normalize(a)
        if x is None:
            x = svd_node_features(a, self.dim)

        a_history, a_recon_history = [], []
        indices, down_outs = [], []
        org_x = x
        for i in range(len(self.ks)):
            x = nn.relu(self.down_gcns[i](a, x, train=train))
            a_history.append(a)
            down_outs.append(x)
            a, x, idx = self.pools[i](a, x, train=train)
            indices.append(idx)

        x = nn.relu(self.bottom_gcn(a, x, train=train))
        for i in range(len(self.ks)):
            up = len(self.ks) - i - 1
            a, idx = a_history[up], indices[up]
            a, x = self.unpools[i](a, x, idx)
            x = nn.relu(self.up_gcns[i](a, x, train=train))
            a_recon_history.append(reconstruct_adjacency(x))
            if self.skip:
                x = x + down_outs[up]
        if self.skip:
            x = x + org_x

        a_up = self.upsampler(x)
        return a_up, tuple(a_history), tuple(a_recon_history)
