"""Minimal torch_geometric shim for importing the reference's
``unet-transformer.py`` (ref: /root/reference/unet-transformer.py:6-7)
without PyG installed.

``GATConv`` is a hand-rolled plain-torch implementation of PyG's
documented GATConv math for the reference's usage
(``GATConv(in, out // heads, heads=heads, dropout=p, concat=True)``,
called as ``gat(X, edge_index, edge_attr)`` — edge_attr is ignored, as
PyG does when ``edge_dim`` is unset):

  * ``lin``: bias-free Linear(in, heads*out), glorot init
  * per-head attention vectors ``att_src``/``att_dst`` (1, H, D), glorot
  * logits_{i<-j} = LeakyReLU_{0.2}(att_src.h_j + att_dst.h_i)
  * softmax over the incoming-edge neighborhood of i, with self-loops
    re-added (``add_self_loops=True`` removes then re-adds them)
  * attention-coefficient dropout at train time
  * heads concatenated, zero-init bias added

Computed densely (masked softmax) instead of PyG's scatter-softmax —
identical math for a deterministic forward; summation-order float
differences only. This mirrors exactly what fcsr_tpu's DenseGAT claims
(models/gat_unet.py), so transplant parity against this shim validates
the claim against real torch autograd + AdamW.

Call ``install()`` BEFORE importing the reference module.
"""

from __future__ import annotations

import math
import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F


def _glorot(t: torch.Tensor):
    # PyG's torch_geometric.nn.inits.glorot: U(+-sqrt(6/(fan_in+fan_out)))
    # over the last two dims (Xavier-uniform)
    if t is not None:
        stdv = math.sqrt(6.0 / (t.size(-2) + t.size(-1)))
        t.data.uniform_(-stdv, stdv)


class GATConv(nn.Module):
    def __init__(self, in_channels: int, out_channels: int, heads: int = 1,
                 dropout: float = 0.0, concat: bool = True, **kwargs):
        super().__init__()
        assert concat, "shim supports concat=True (the reference's usage)"
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.heads = heads
        self.dropout = dropout
        self.lin = nn.Linear(in_channels, heads * out_channels, bias=False)
        self.att_src = nn.Parameter(torch.empty(1, heads, out_channels))
        self.att_dst = nn.Parameter(torch.empty(1, heads, out_channels))
        self.bias = nn.Parameter(torch.zeros(heads * out_channels))
        _glorot(self.lin.weight)
        _glorot(self.att_src)
        _glorot(self.att_dst)

    def forward(self, x, edge_index, edge_attr=None):
        del edge_attr  # no edge_dim configured -> ignored (PyG semantics)
        n = x.size(0)
        h = self.lin(x).view(n, self.heads, self.out_channels)
        a_src = (h * self.att_src).sum(-1)            # (n, H)
        a_dst = (h * self.att_dst).sum(-1)
        # logits[i, j, :]: edge j -> i
        logits = F.leaky_relu(a_src.unsqueeze(0) + a_dst.unsqueeze(1), 0.2)
        mask = torch.zeros(n, n, dtype=torch.bool, device=x.device)
        mask[edge_index[1], edge_index[0]] = True     # target <- source
        mask |= torch.eye(n, dtype=torch.bool, device=x.device)
        logits = logits.masked_fill(~mask.unsqueeze(-1), float("-inf"))
        alpha = torch.softmax(logits, dim=1)
        alpha = alpha.masked_fill(~mask.unsqueeze(-1), 0.0)
        if self.dropout > 0 and self.training:
            alpha = F.dropout(alpha, p=self.dropout, training=True)
        out = torch.einsum("ijh,jhd->ihd", alpha, h)
        return out.reshape(n, self.heads * self.out_channels) + self.bias


class _Unused(nn.Module):
    """Imported by the reference but never instantiated on the shipped
    path (TransformerConv usage is commented out,
    ref: unet-transformer.py:371-373)."""

    def __init__(self, *a, **kw):
        raise NotImplementedError(
            f"{type(self).__name__} is not used by the reference's "
            "shipped GAT path; the shim does not implement it")


class TransformerConv(_Unused):
    pass


class GINConv(_Unused):
    pass


def dense_to_sparse(adj: torch.Tensor):
    """(ref usage: unet-transformer.py:377) COO edge index + weights of
    the nonzero entries."""
    idx = torch.nonzero(adj, as_tuple=False).t()
    return idx, adj[idx[0], idx[1]]


def to_dense_adj(edge_index, batch=None, edge_attr=None,
                 max_num_nodes=None):
    n = max_num_nodes or int(edge_index.max()) + 1
    a = torch.zeros(1, n, n, dtype=torch.float32,
                    device=edge_index.device)
    vals = edge_attr if edge_attr is not None else torch.ones(
        edge_index.size(1), device=edge_index.device)
    a[0, edge_index[0], edge_index[1]] = vals.flatten().to(a.dtype)
    return a


def install(reference_path: str = "/root/reference"):
    """Register the shims the reference's import chain needs:

    * ``torch_geometric`` (this module's GATConv & co);
    * ``pytorch_lightning`` — ``utils/slim.py:3`` subclasses
      ``pl.LightningDataModule`` purely as a container base class;
    * ``MatrixVectorizer`` — ``utils/slim.py:6`` imports from a
      top-level module that does not exist in the reference checkout
      (the class actually lives in ``utils/matrix_vectorizer.py``).
    """
    if "torch_geometric" not in sys.modules:
        pkg = types.ModuleType("torch_geometric")
        nn_mod = types.ModuleType("torch_geometric.nn")
        nn_mod.GATConv = GATConv
        nn_mod.TransformerConv = TransformerConv
        nn_mod.GINConv = GINConv
        utils_mod = types.ModuleType("torch_geometric.utils")
        utils_mod.dense_to_sparse = dense_to_sparse
        utils_mod.to_dense_adj = to_dense_adj
        pkg.nn = nn_mod
        pkg.utils = utils_mod
        sys.modules["torch_geometric"] = pkg
        sys.modules["torch_geometric.nn"] = nn_mod
        sys.modules["torch_geometric.utils"] = utils_mod
    if "pytorch_lightning" not in sys.modules:
        pl_mod = types.ModuleType("pytorch_lightning")

        class LightningDataModule:
            def __init__(self, *a, **kw):
                pass

        pl_mod.LightningDataModule = LightningDataModule
        sys.modules["pytorch_lightning"] = pl_mod
    if "MatrixVectorizer" not in sys.modules:
        if reference_path not in sys.path:
            sys.path.insert(0, reference_path)
        from utils.matrix_vectorizer import MatrixVectorizer as MV
        mv_mod = types.ModuleType("MatrixVectorizer")
        mv_mod.MatrixVectorizer = MV
        sys.modules["MatrixVectorizer"] = mv_mod
