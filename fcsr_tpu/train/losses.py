"""Loss functions for all model families."""

from __future__ import annotations

import functools

import jax.numpy as jnp

__all__ = ["l1", "gsr_composite_loss", "offdiag_mse_loss",
           "intermediate_recon_loss", "make_triu_mse_criterion",
           "pack_triu_targets"]


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


@functools.lru_cache(maxsize=16)
def make_triu_mse_criterion(n_out: int):
    """Criterion computing the dense-matrix MSE of a symmetric-from-triu
    prediction ENTIRELY in vector space.

    For a prediction that would be scattered as ``M = sym(scatter(v))``
    (zero diagonal) and a symmetric target ``T``:

        mean((M - T)^2) over n^2 elements
          = (2 * sum((v - triu(T))^2) + sum(diag(T)^2)) / (B * n^2)

    — each off-diagonal pair appears twice, the diagonal prediction is 0.
    Used by the MLP training path so the 35778-wide backward never fuses
    with the triu scatter (a pathological XLA-TPU compile, see
    SpectralResMLP docstring); identical to matrix-space
    ``mse_criterion`` up to float reassociation (tested).

    The returned criterion accepts ``pred`` as the (B, L) triu vector and
    ``target`` either as dense (B, n, n) matrices or — preferred for the
    train path, so not even a target gather sits next to the wide
    backward matmuls — as pre-packed (B, L + n) rows
    ``[triu(T), diag(T)]`` (see ``pack_triu_targets``).
    """
    import numpy as np

    from fcsr_tpu.core.vectorize import triu_indices_rowmajor
    rows, cols = triu_indices_rowmajor(n_out)
    didx = np.arange(n_out)
    m = len(rows)

    def criterion(pred_vec, target):
        b = target.shape[0]
        if target.ndim == 2:  # packed [triu, diag]
            t_vec, t_diag = target[:, :m], target[:, m:]
        else:
            t_vec = target[:, rows, cols]
            t_diag = target[:, didx, didx]
        sq = jnp.sum((pred_vec - t_vec) ** 2)
        return (2.0 * sq + jnp.sum(t_diag ** 2)) / (b * n_out * n_out)

    return criterion


def pack_triu_targets(hr_mats):
    """(N, n, n) symmetric targets -> (N, L + n) packed
    ``[row-major triu, diagonal]`` rows for ``make_triu_mse_criterion``."""
    import numpy as np

    from fcsr_tpu.core.vectorize import triu_indices_rowmajor
    hr_mats = np.asarray(hr_mats)
    n = hr_mats.shape[-1]
    rows, cols = triu_indices_rowmajor(n)
    didx = np.arange(n)
    return np.concatenate([hr_mats[:, rows, cols],
                           hr_mats[:, didx, didx]], axis=1)


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
