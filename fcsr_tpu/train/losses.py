"""Loss functions for all model families."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["l1", "gsr_composite_loss", "offdiag_mse_loss",
           "intermediate_recon_loss"]


def l1(a, b):
    """Mean absolute error, torch ``nn.L1Loss`` semantics."""
    return jnp.mean(jnp.abs(a - b))


def gsr_composite_loss(pred, net_outs, start_gcn_outs, gsr_weights,
                       u_hr_reduced, hr, lmbda: float):
    """The GSR-Net training loss (ref: utils/gsr_train.py:39-41):

        lmbda * L1(net_outs, start_gcn_outs)      # U-Net self-consistency
        + L1(W_gsr, U_hr[:, :lr_dim])             # spectral alignment
        + L1(prediction, hr)                      # reconstruction

    Returns (loss, reconstruction_mae).
    """
    recon = l1(pred, hr)
    loss = (lmbda * l1(net_outs, start_gcn_outs)
            + l1(gsr_weights, u_hr_reduced)
            + recon)
    return loss, recon


def _zero_diag(m):
    n = m.shape[-1]
    return m * (1.0 - jnp.eye(n, dtype=m.dtype))


def offdiag_mse_loss(pred, target):
    """MSE with the diagonal removed from both operands
    (ref: unet-transformer.py:460-466)."""
    return jnp.mean((_zero_diag(pred) - _zero_diag(target)) ** 2)


def intermediate_recon_loss(a_hist, a_recon_hist_reversed):
    """Sum of off-diagonal MSEs between the down-path adjacencies and the
    reversed up-path reconstructions (ref: unet-transformer.py:468-474)."""
    total = 0.0
    for a, a_recon in zip(a_hist, a_recon_hist_reversed):
        total = total + offdiag_mse_loss(a, a_recon)
    return total
