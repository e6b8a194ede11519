"""GraphSAGE / linear-interpolation upsampling baseline
(ref: models/upsample.py).

Batched end-to-end: constant-ones node features, hand-rolled GCN layers
(A @ H @ Omega + beta), 1-D linear interpolation from lr_dim to hr_dim
nodes along the node axis (torch.nn.functional.interpolate semantics,
align_corners=False), inner-product decode with sigmoid, hard threshold.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

__all__ = ["GCNLayer", "GraphSAGEUpsampler", "linear_interp_matrix"]


@functools.lru_cache(maxsize=None)
def _interp_weights(n_in: int, n_out: int):
    """Sparse (two-tap) weights of 1-D linear interpolation,
    torch.nn.functional.interpolate(mode='linear', align_corners=False):
    output i samples input coordinate (i + 0.5) * n_in / n_out - 0.5 with
    edge clamping. Returned as a dense (n_in, n_out) matrix so the resample
    is a single MXU matmul."""
    scale = n_in / n_out
    w = np.zeros((n_in, n_out), dtype=np.float32)
    for i in range(n_out):
        x = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        frac = x - x0
        lo = min(max(x0, 0), n_in - 1)
        hi = min(max(x0 + 1, 0), n_in - 1)
        w[lo, i] += 1.0 - frac
        w[hi, i] += frac
    return w


def linear_interp_matrix(n_in: int, n_out: int) -> jnp.ndarray:
    return jnp.asarray(_interp_weights(n_in, n_out))


class GCNLayer(nn.Module):
    """A @ H @ Omega + beta with He-ish randn init
    (ref: models/upsample.py:12-29)."""
    input_dim: int
    output_dim: int
    use_nonlinearity: bool = True

    @nn.compact
    def __call__(self, a_norm, h):
        scale = float(np.sqrt(2.0 / (self.input_dim + self.output_dim)))
        omega = self.param("omega", nn.initializers.normal(stddev=scale),
                           (self.input_dim, self.output_dim))
        beta = self.param("beta", nn.initializers.zeros, (self.output_dim,))
        agg = jnp.matmul(a_norm, h, preferred_element_type=jnp.float32)
        out = jnp.matmul(agg, omega,
                         preferred_element_type=jnp.float32) + beta
        return nn.relu(out) if self.use_nonlinearity else out


class GraphSAGEUpsampler(nn.Module):
    """ref: models/upsample.py:33-83 ('GraphSAGE'). Input: (B, n, n)
    adjacencies; output: (B, m, m) thresholded sigmoid inner products."""
    hidden_channels: int
    out_size: int
    n_layers: int = 2
    threshold: float = 0.2

    @nn.compact
    def __call__(self, a_batch, train: bool = False):
        del train  # no dropout/batchnorm in this baseline
        b, n, _ = a_batch.shape
        x = jnp.ones((b, n, self.hidden_channels), dtype=a_batch.dtype)
        for i in range(self.n_layers - 1):
            x = GCNLayer(self.hidden_channels, self.hidden_channels,
                         name=f"gcn_{i}")(a_batch, x)
        x = GCNLayer(self.hidden_channels, self.hidden_channels,
                     use_nonlinearity=False,
                     name=f"gcn_{self.n_layers - 1}")(a_batch, x)
        # node-axis linear resample n -> m: X^T (B, C, n) @ W (n, m)
        w = linear_interp_matrix(n, self.out_size)
        x = jnp.einsum("bnc,nm->bmc", x, w)
        logits = jnp.einsum("bmc,bkc->bmk", x, x)
        a_pred = nn.sigmoid(logits)
        return a_pred * (a_pred > self.threshold)
