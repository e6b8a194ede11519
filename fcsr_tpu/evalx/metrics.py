"""On-device global metrics: MAE, Pearson r, Jensen-Shannon distance, and
the per-sample edge-weight-histogram KL divergence.

These are jnp re-implementations of the scipy/sklearn calls in the
reference's evaluation pass (ref: utils/evaluation.py:44-63,106-112),
validated against scipy in tests.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["mae", "pearson_corr", "jensen_shannon_distance",
           "weight_histogram_kl", "edge_weight_mask"]


def mae(a, b):
    return jnp.mean(jnp.abs(jnp.asarray(a) - jnp.asarray(b)))


def pearson_corr(x, y):
    """Pearson correlation coefficient (scipy.stats.pearsonr[0]),
    computed in f64 — this is the scipy fallback for the OFFICIAL PCC
    over ~6M-element stacks, where f32 summation loses 3-4 digits."""
    x = jnp.asarray(x, dtype=jnp.float64)
    y = jnp.asarray(y, dtype=jnp.float64)
    xm = x - x.mean()
    ym = y - y.mean()
    num = jnp.sum(xm * ym)
    den = jnp.sqrt(jnp.sum(xm * xm) * jnp.sum(ym * ym))
    return num / den


def jensen_shannon_distance(p, q):
    """scipy.spatial.distance.jensenshannon semantics: normalize inputs to
    probability vectors, JS divergence with natural log, return the sqrt."""
    p = jnp.asarray(p, dtype=jnp.float64)
    q = jnp.asarray(q, dtype=jnp.float64)
    p = p / p.sum()
    q = q / q.sum()
    m = (p + q) / 2.0

    def kl(a, b):
        ratio = jnp.where(a > 0, a / jnp.where(b > 0, b, 1.0), 1.0)
        return jnp.sum(jnp.where(a > 0, a * jnp.log(ratio), 0.0))

    js = (kl(p, m) + kl(q, m)) / 2.0
    return jnp.sqrt(jnp.maximum(js, 0.0))


def edge_weight_mask(w):
    """Boolean mask of undirected non-self-loop edges (i < j, weight != 0) —
    the edge set networkx builds from a dense matrix after removing self
    loops (ref: utils/evaluation.py:28-35)."""
    n = w.shape[-1]
    iu = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)
    return iu & (w != 0)


def _masked_histogram(values, mask, lo, hi, bins: int):
    """Fixed-bin histogram of ``values`` restricted to ``mask``; replicates
    numpy.histogram's closed right edge on the final bin."""
    width = (hi - lo) / bins
    idx = jnp.floor((values - lo) / jnp.where(width > 0, width, 1.0))
    idx = jnp.clip(idx, 0, bins - 1).astype(jnp.int32)
    flat_idx = jnp.where(mask, idx, bins)  # out-of-range slot for masked-out
    counts = jnp.zeros(bins + 1, dtype=jnp.float32).at[
        flat_idx.reshape(-1)].add(jnp.where(mask, 1.0, 0.0).reshape(-1))
    return counts[:bins]


def weight_histogram_kl(gt, pred, bins: int = 50, eps: float = 1e-10):
    """KL divergence between 50-bin edge-weight distributions of one
    ground-truth / prediction matrix pair (ref: utils/evaluation.py:44-63).

    Bin range is [min, max] over the union of both graphs' (nonzero,
    off-diagonal, upper-triangle) edge weights; histograms are
    density-normalized, epsilon-smoothed, renormalized, then
    KL(gt || pred) with natural log.
    """
    gt = jnp.asarray(gt)
    pred = jnp.asarray(pred)
    m_gt = edge_weight_mask(gt)
    m_pr = edge_weight_mask(pred)
    big = jnp.finfo(jnp.float32).max

    # edgeless graphs use placeholder value 0 (ref: utils/evaluation.py:38-41)
    any_gt = m_gt.any()
    any_pr = m_pr.any()
    min_gt = jnp.where(any_gt, jnp.min(jnp.where(m_gt, gt, big)), 0.0)
    max_gt = jnp.where(any_gt, jnp.max(jnp.where(m_gt, gt, -big)), 0.0)
    min_pr = jnp.where(any_pr, jnp.min(jnp.where(m_pr, pred, big)), 0.0)
    max_pr = jnp.where(any_pr, jnp.max(jnp.where(m_pr, pred, -big)), 0.0)
    lo = jnp.minimum(min_gt, min_pr)
    hi = jnp.maximum(max_gt, max_pr)

    # numpy adds eps to DENSITY values (counts / (total * width)), and the
    # renormalization does not commute with adding eps to raw counts — so
    # convert to densities first (ref: utils/evaluation.py:49-59).
    width = jnp.where(hi > lo, (hi - lo) / bins, 1.0)

    # reference semantics: an EDGELESS graph contributes one literal
    # placeholder weight 0.0 to its histogram (ref: :38-41 builds the
    # weight list as [0] and bins it) — not an empty histogram, which
    # would smooth to uniform and report a wildly different KL exactly
    # when a prediction degenerates
    idx0 = jnp.clip(jnp.floor((0.0 - lo) / width), 0,
                    bins - 1).astype(jnp.int32)
    placeholder = jnp.zeros(bins, jnp.float32).at[idx0].set(1.0)

    def density(values, mask, has_edges):
        counts = _masked_histogram(values, mask, lo, hi, bins)
        counts = jnp.where(has_edges, counts, placeholder)
        total = jnp.where(has_edges, jnp.maximum(mask.sum(), 1), 1)
        d = counts / (total * width) + eps
        return d / d.sum()

    h_gt = density(gt, m_gt, any_gt)
    h_pr = density(pred, m_pr, any_pr)
    return jnp.sum(h_gt * jnp.log(h_gt / h_pr))
