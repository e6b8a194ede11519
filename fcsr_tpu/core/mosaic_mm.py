"""Error-compensated matmuls for Mosaic (Pallas-TPU) kernels.

Mosaic dots support only DEFAULT precision — ``HIGHEST`` crashes the TPU
compile service and ``HIGH`` is rejected — so f32-class accuracy must be
built manually from bf16 MXU passes. Two equivalent formulations of the
classic three-term compensation a_hi@b_hi + a_hi@b_lo + a_lo@b_hi
(error O(eps_bf16^2), same accuracy class as XLA's f32 matmuls):

* ``mm_bf16x3``        — three separate dots + two adds.
* ``mm_bf16x3_concat`` — ONE dot over operands concatenated along the
  contraction dim ([a_hi a_lo a_hi] @ [b_hi; b_hi; b_lo]). The three
  partial products accumulate inside the MXU's f32 accumulator (at least
  as accurate as the explicit adds), and the kernel issues one MXU op
  instead of three — which matters because the GSR kernels are
  launch/latency-bound on tiny (<=268) matmuls.

``mm`` is the public entry. It carries a ``custom_vjp`` with the IDEAL
matmul adjoints (da = mm(ct, b^T), db = mm(a^T, ct), themselves
compensated): differentiating *through* the bf16 decomposition would
bf16-round the COTANGENTS (the backward of ``astype(bf16)`` casts the
incoming cotangent), which costs ~3 decimal digits exactly where
gradients cancel. With the custom adjoints every consumer — XLA autodiff
over the pure rank-select path, the in-kernel ``jax.value_and_grad`` of
the fused tail, and the hand-written U-Net backward kernel — sees
f32-class gradients, and the backward costs one compensated matmul per
operand instead of a differentiated cast chain.

MODE selects the formulation for experiments (read at TRACE time —
callers must rebuild/clear their kernel caches after changing it; the
FCSR_MM_MODE env var sets the process-wide default).

``mm_bf16`` (MODE="bf16") is the experimental fast mode: a single
truncated-bf16 MXU pass — 3x less MXU work than the compensated modes,
but bf16 operand rounding (NOT f32-class). Gradients use the same
single-pass product via the ideal adjoints. Quality/perf tradeoff
measured in PERF.md; the default stays compensated.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = ["mm", "mm_compensated", "mm_compensated3", "mm_bf16", "mm_bf16x3",
           "mm_bf16x3_concat", "MODE"]

MODE = os.environ.get("FCSR_MM_MODE", "bf16x3_concat")


def _split(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def mm_bf16x3(a, b):
    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
    a_lo = a - a_hi
    b_lo = b - b_hi
    dot = lambda x, y: jnp.matmul(x, y, preferred_element_type=jnp.float32)
    return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)


def mm_bf16x3_concat(a, b):
    a_hi, a_lo = _split(a)
    b_hi, b_lo = _split(b)
    a_cat = jnp.concatenate([a_hi, a_lo, a_hi], axis=1)
    b_cat = jnp.concatenate([b_hi, b_hi, b_lo], axis=0)
    if jax.default_backend() != "tpu":
        # XLA-CPU's dot thunk rejects BF16 x BF16 = F32; f32 operands give
        # bit-identical products (the values are exactly bf16-representable)
        # with the same f32 accumulation
        a_cat = a_cat.astype(jnp.float32)
        b_cat = b_cat.astype(jnp.float32)
    return jnp.matmul(a_cat, b_cat, preferred_element_type=jnp.float32)


def mm_bf16(a, b):
    """Single-pass truncated-bf16 product with f32 accumulation."""
    a16 = a.astype(jnp.bfloat16)
    b16 = b.astype(jnp.bfloat16)
    if jax.default_backend() != "tpu":
        a16 = a16.astype(jnp.float32)
        b16 = b16.astype(jnp.float32)
    return jnp.matmul(a16, b16, preferred_element_type=jnp.float32)


def _impl(a, b):
    if MODE == "bf16x3_concat":
        return mm_bf16x3_concat(a, b)
    if MODE == "bf16":
        return mm_bf16(a, b)
    if MODE == "bf16x3":
        return mm_bf16x3(a, b)
    # a typo'd FCSR_MM_MODE must not silently select a slower/different
    # rounding mode — benches would report results for a mode the user
    # never chose
    raise ValueError(
        f"unknown FCSR_MM_MODE={MODE!r}; expected 'bf16x3_concat', "
        "'bf16' or 'bf16x3'")


@jax.custom_vjp
def mm(a, b):
    return _impl(a, b)


def _mm_fwd(a, b):
    return _impl(a, b), (a, b)


def _mm_bwd(res, ct):
    a, b = res
    return _impl(ct, b.T), _impl(a.T, ct)


mm.defvjp(_mm_fwd, _mm_bwd)


@jax.custom_vjp
def mm_compensated(a, b):
    """Always-compensated (bf16x3_concat) variant, ignoring MODE — for
    kernels whose tiny operands make the single-pass bf16 mode SLOWER
    (the bf16 tile relayouts dominate; measured on the GAT kernel,
    PERF.md 'GAT-specific kernel findings')."""
    return mm_bf16x3_concat(a, b)


def _mmc_fwd(a, b):
    return mm_bf16x3_concat(a, b), (a, b)


def _mmc_bwd(res, ct):
    a, b = res
    return mm_bf16x3_concat(ct, b.T), mm_bf16x3_concat(a.T, ct)


mm_compensated.defvjp(_mmc_fwd, _mmc_bwd)


@jax.custom_vjp
def mm_compensated3(a, b):
    """Always-compensated THREE-DOT variant (no operand concats), with
    the same ideal adjoints. Hypothesis tested on the GAT kernel (whose
    matmuls are tiny): the concat form's relayouts might cost more than
    the two extra dot issues save. Measured NO — the concat form still
    wins there (36.3 s vs 42.7 s train, v5e), so every kernel uses the
    concat form; this variant stays as the recorded control."""
    return mm_bf16x3(a, b)


def _mmc3_fwd(a, b):
    return mm_bf16x3(a, b), (a, b)


def _mmc3_bwd(res, ct):
    a, b = res
    return mm_bf16x3(ct, b.T), mm_bf16x3(a.T, ct)


mm_compensated3.defvjp(_mmc3_fwd, _mmc3_bwd)
