"""Adjacency normalization and padding primitives.

Functional (jit/vmap-friendly) equivalents of the reference's in-place
torch ops (ref: utils/preprocessing.py:10-33, unet-transformer.py:31-45).
All functions accept a single (n, n) matrix; batched use is via ``jax.vmap``
or the leading-batch broadcasting where noted.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "normalize_adj",
    "normalize_adj_np",
    "symmetric_normalize",
    "pad_hr_adj",
    "unpad",
    "fill_diagonal",
    "symmetrize",
]


def normalize_adj_np(mx):
    """Host-numpy batched D^-1/2 A D^-1/2 with the reference's inf->0
    zero-degree guard (ref: utils/preprocessing.py:16-25) — the shared
    helper for host-side preprocessing (staging, spectral precompute,
    prediction). For the SYMMETRIC adjacencies it is applied to this
    equals ``normalize_adj`` exactly (the reference's transpose quirk
    cancels). Accepts (..., n, n); preserves dtype class."""
    import numpy as np

    mx = np.asarray(mx)
    rowsum = mx.sum(axis=-1)
    with np.errstate(divide="ignore"):
        r = rowsum ** -0.5
    r[np.isinf(r)] = 0.0
    return mx * r[..., None, :] * r[..., :, None]


def normalize_adj(mx):
    """Symmetric degree normalization D^-1/2 A D^-1/2 with inf->0 guard.

    Replicates the exact operation order of the reference
    (ref: utils/preprocessing.py:16-25): scale columns by d^-1/2, transpose,
    scale columns again — i.e. D^-1/2 A^T D^-1/2, which equals
    D^-1/2 A D^-1/2 for the symmetric adjacencies this is applied to.
    Zero-degree rows produce inf in d^-1/2 and are zeroed, as in the
    reference's isinf guard.
    """
    mx = jnp.asarray(mx)
    rowsum = mx.sum(axis=-1)
    r_inv_sqrt = jnp.power(rowsum, -0.5)
    r_inv_sqrt = jnp.where(jnp.isinf(r_inv_sqrt), 0.0, r_inv_sqrt)
    mx = mx * r_inv_sqrt[..., None, :]
    mx = jnp.swapaxes(mx, -1, -2)
    mx = mx * r_inv_sqrt[..., None, :]
    return mx


def symmetric_normalize(a_tilde, eps: float = 1e-5):
    """D^-1/2 (A) D^-1/2 with an epsilon-regularized degree.

    The GAT-U-Net variant of normalization
    (ref: unet-transformer.py:31-45): d = rowsum + eps, no inf guard needed.
    """
    a_tilde = jnp.asarray(a_tilde)
    d = a_tilde.sum(axis=-1) + eps
    r = jnp.power(d, -0.5)
    return a_tilde * r[..., None, :] * r[..., :, None]


def pad_hr_adj(label, split: int):
    """Zero-pad by ``split`` on each side and set the diagonal to 1
    (ref: utils/preprocessing.py:10-14). On-device, no host round-trip."""
    label = jnp.asarray(label)
    if split:
        pad = [(0, 0)] * (label.ndim - 2) + [(split, split), (split, split)]
        label = jnp.pad(label, pad)
    return fill_diagonal(label, 1.0)


def unpad(data, split: int):
    """Crop ``split`` rows/cols from every side
    (ref: utils/preprocessing.py:27-33)."""
    if split == 0:
        return data
    return data[..., split:data.shape[-2] - split, split:data.shape[-1] - split]


def fill_diagonal(m, value):
    """Functional fill_diagonal for the trailing two axes."""
    m = jnp.asarray(m)
    n = m.shape[-1]
    eye = jnp.eye(n, dtype=bool)
    return jnp.where(eye, jnp.asarray(value, dtype=m.dtype), m)


def symmetrize(m):
    """(M + M^T) / 2 over the trailing two axes."""
    return (m + jnp.swapaxes(m, -1, -2)) / 2
