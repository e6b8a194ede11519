"""Seeded synthetic connectome generator.

The Kaggle challenge data (SLIM functional connectomes) is private; benches
and tests need statistically similar stand-ins: symmetric, nonnegative,
zero-diagonal matrices with values in [0, 1], a community (modular)
structure, and an LR -> HR relationship that is actually learnable (the HR
matrix is a smooth lift of the LR one plus structured residue).
"""

from __future__ import annotations

import numpy as np

LR_DIM = 160
HR_DIM = 268

__all__ = ["synthesize_paired_connectomes"]


def _random_membership(rng, n_nodes: int, n_comm: int) -> np.ndarray:
    """Soft community membership matrix (n_nodes, n_comm), rows on simplex."""
    m = rng.gamma(shape=0.5, scale=1.0, size=(n_nodes, n_comm))
    return m / m.sum(axis=1, keepdims=True)


def synthesize_paired_connectomes(n_subjects: int, lr_dim: int = LR_DIM,
                                  hr_dim: int = HR_DIM, n_comm: int = 12,
                                  noise: float = 0.08, seed: int = 42):
    """Generate (lr, hr) stacks of paired connectomes.

    Each subject gets a community-strength profile on a fixed LR
    parcellation; the HR matrix is a LIFT of the subject's clean LR matrix
    through a fixed soft parcellation map L (each HR node mixes a couple of
    LR parents): hr ~ L @ lr_clean @ L^T.  This mirrors how real nested
    brain parcellations relate across resolutions and — crucially — makes
    the HR spectrum a function of the LR eigenbasis, so spectral
    super-resolution models (GSR-Net) have genuine signal to learn, not
    just the mean.

    Returns (lr, hr): float32 arrays (n, lr_dim, lr_dim), (n, hr_dim, hr_dim),
    symmetric, zero diagonal, clipped to [0, 1].
    """
    rng = np.random.default_rng(seed)
    # fixed LR parcellation + fixed HR<-LR lift shared across subjects
    p_lr = _random_membership(rng, lr_dim, n_comm)
    lift = rng.gamma(shape=0.3, scale=1.0, size=(hr_dim, lr_dim))
    # concentrate each HR node on a dominant LR parent for realism
    parents = rng.integers(0, lr_dim, size=hr_dim)
    lift[np.arange(hr_dim), parents] += 3.0
    lift = lift / lift.sum(axis=1, keepdims=True)

    lr_out = np.empty((n_subjects, lr_dim, lr_dim), dtype=np.float32)
    hr_out = np.empty((n_subjects, hr_dim, hr_dim), dtype=np.float32)
    for i in range(n_subjects):
        c = rng.gamma(shape=1.5, scale=1.0, size=(n_comm, n_comm))
        c = (c + c.T) / 2
        c = c / c.max()
        lr_clean = p_lr @ c @ p_lr.T
        lr_clean = lr_clean / max(lr_clean.max(), 1e-9)
        hr_clean = lift @ lr_clean @ lift.T
        hr_clean = hr_clean / max(hr_clean.max(), 1e-9)
        e_lr = rng.normal(0.0, noise, size=(lr_dim, lr_dim))
        e_hr = rng.normal(0.0, noise, size=(hr_dim, hr_dim))
        lr = lr_clean + (e_lr + e_lr.T) / 2
        hr = hr_clean + (e_hr + e_hr.T) / 2
        for m, out in ((lr, lr_out[i]), (hr, hr_out[i])):
            m = np.clip(m, 0.0, 1.0)
            np.fill_diagonal(m, 0.0)
            out[:] = m.astype(np.float32)
    return lr_out, hr_out
