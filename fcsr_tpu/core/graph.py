"""Dense <-> COO graph conversions and node-feature builders.

The reference's data layer materializes PyG ``Data`` objects (edge_index /
edge_attr COO, ref: utils/data.py:15-54) and a topological node-feature
builder (ref: dataset.py:14-102). The TPU framework is dense-native —
connectomes are small (<=268 nodes) and nearly dense, so dense (B, n, n)
stacks are the canonical form — but COO conversion is provided for
interop/export, and the feature builder runs batched on device.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["COOGraph", "create_graph", "to_dense_adj",
           "topological_node_features"]


class COOGraph(NamedTuple):
    """Edge-list graph: the dense-free exchange format
    (mirrors PyG Data: x / edge_index / edge_attr / num_nodes)."""
    x: np.ndarray            # (n, f) node features
    edge_index: np.ndarray   # (2, e) int
    edge_attr: np.ndarray    # (e,) weights
    num_nodes: int


def create_graph(adjacency: np.ndarray,
                 node_features: Optional[np.ndarray] = None) -> COOGraph:
    """Dense adjacency -> COO graph; edges where A > 0, ones features by
    default (ref: utils/data.py:15-54)."""
    adjacency = np.asarray(adjacency)
    rows, cols = np.where(adjacency > 0)
    edge_index = np.stack([rows, cols])
    edge_attr = adjacency[rows, cols]
    x = (node_features if node_features is not None
         else np.ones((adjacency.shape[0], 1), dtype=adjacency.dtype))
    return COOGraph(x=x, edge_index=edge_index, edge_attr=edge_attr,
                    num_nodes=adjacency.shape[0])


def to_dense_adj(graph: COOGraph) -> np.ndarray:
    """COO -> dense (PyG to_dense_adj single-graph semantics)."""
    a = np.zeros((graph.num_nodes, graph.num_nodes),
                 dtype=graph.edge_attr.dtype)
    a[graph.edge_index[0], graph.edge_index[1]] = graph.edge_attr
    return a


def topological_node_features(w) -> Dict[str, jnp.ndarray]:
    """Batched on-device topological node features
    (ref: dataset.py:34-99 ``calculate_topological_metrics``):

      degree      — unweighted neighbor count
      strength    — weighted degree (row sum)
      clustering  — unweighted local clustering coefficient
      closeness   — the reference's proxy: 1 / (strength + eps)
                    (ref: dataset.py:63-68 inverts summed weights rather
                    than running shortest paths; reproduced as-is)
      eigenvector — 50-step power iteration on W (ref: dataset.py:74-82)

    The reference's betweenness branch is an unfinished ``pass`` stub
    (ref: dataset.py:84-87); the faithful evaluator's pivot-Brandes kernel
    (evalx.centrality) is the supported way to get betweenness.
    Input (B, n, n) or (n, n); returns a dict of (..., n) arrays.
    """
    w = jnp.asarray(w)
    adj = (w > 0).astype(w.dtype)
    n = w.shape[-1]
    eye = jnp.eye(n, dtype=w.dtype)
    adj = adj * (1 - eye)

    degree = adj.sum(axis=-1)
    strength = (w * (1 - eye)).sum(axis=-1)

    # triangles through i = (A^3)_ii / 2 ; clustering = 2T / (d (d - 1))
    a2 = jnp.matmul(adj, adj, preferred_element_type=jnp.float32)
    tri = jnp.einsum("...ij,...ji->...i", a2, adj) / 2.0
    denom = degree * (degree - 1.0)
    clustering = jnp.where(denom > 0, 2.0 * tri / jnp.where(denom > 0,
                                                            denom, 1.0), 0.0)

    closeness = 1.0 / (strength + 1e-9)

    def ec_one(wm):
        x = jnp.ones((wm.shape[-1],), dtype=wm.dtype)
        for _ in range(50):
            x = wm @ x
            x = x / (jnp.linalg.norm(x) + 1e-12)
        return x

    ec = ec_one(w) if w.ndim == 2 else jax.vmap(ec_one)(w)

    return {"degree": degree, "strength": strength,
            "clustering": clustering, "closeness": closeness,
            "eigenvector": ec}
