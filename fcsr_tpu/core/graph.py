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
    """Batched on-device topological node features, replicating the
    reference's ``calculate_topological_metrics`` exactly
    (ref: dataset.py:14-102):

      degree          — WEIGHTED row sum (the reference's 'degree')
      strength        — identical to degree (ref clones it, dataset.py:25)
      clustering      — diag(W^3) / (degree * (degree - 1)), weighted,
                        no 1/2 factor (ref: dataset.py:27-35)
      avg_neighbor_degree — (W @ degree) / |{j : w_ij > 0}| (ref: :38-44)
      degree_centrality   — degree / (n - 1) (ref: :47)
      closeness       — rowsum((I - W)^-1) / (n - 1): a resolvent proxy,
                        not shortest paths (ref: :49-52; reproduced as-is,
                        including its numerical fragility when the
                        spectral radius of W is near 1)
      betweenness     — zeros: the reference's loop is an unfinished
                        ``pass`` stub (ref: :55-61); use
                        evalx.centrality.betweenness_centrality for a real
                        value
      eigenvector     — 100-step power iteration on W, L2-normalized
                        (ref: :63-67)

    Input (B, n, n) or (n, n); returns a dict of (..., n) arrays plus
    ``stacked``: the reference's (..., n, 8) feature tensor layout
    (ref: dataset.py:87-100).
    """
    w = jnp.asarray(w, dtype=jnp.float32)
    n = w.shape[-1]

    degree = w.sum(axis=-1)
    strength = degree

    w3 = jnp.matmul(w, jnp.matmul(w, w, preferred_element_type=jnp.float32),
                    preferred_element_type=jnp.float32)
    triangles = jnp.diagonal(w3, axis1=-2, axis2=-1)
    possible = degree * (degree - 1.0)
    clustering = jnp.where(possible > 0,
                           triangles / jnp.where(possible > 0, possible,
                                                 1.0), 0.0)

    neighbor_deg = jnp.einsum("...ij,...j->...i", w, degree)
    neighbor_cnt = (w > 0).sum(axis=-1).astype(w.dtype)
    avg_neighbor_degree = jnp.where(
        neighbor_cnt > 0,
        neighbor_deg / jnp.where(neighbor_cnt > 0, neighbor_cnt, 1.0), 0.0)

    degree_centrality = degree / (n - 1)

    eye = jnp.eye(n, dtype=w.dtype)
    resolvent = jnp.linalg.inv(eye - w)
    closeness = resolvent.sum(axis=-1) / (n - 1)

    betweenness = jnp.zeros_like(degree)

    def ec_one(wm):
        x = jnp.ones((wm.shape[-1],), dtype=wm.dtype)
        for _ in range(100):
            x = wm @ x
            x = x / jnp.linalg.norm(x)
        return x

    ec = ec_one(w) if w.ndim == 2 else jax.vmap(ec_one)(w)

    feats = {"degree": degree, "strength": strength,
             "clustering": clustering,
             "avg_neighbor_degree": avg_neighbor_degree,
             "degree_centrality": degree_centrality,
             "closeness": closeness, "betweenness": betweenness,
             "eigenvector": ec}
    feats["stacked"] = jnp.stack(
        [degree, strength, clustering, avg_neighbor_degree,
         degree_centrality, closeness, betweenness, ec], axis=-1)
    return feats
