"""GSR-Net training/eval loops, restructured for TPU.

The reference trains with a per-subject Python loop (batch size 1) and
recomputes a 160^2 and a 268^2 ``eigh`` EVERY optimizer step
(ref: utils/gsr_train.py:19-46).  Both decompositions are of constant data
(the normalized LR adjacency; the padded HR label), so here they are
precomputed ONCE, batched, and the entire multi-epoch training run executes
as one jitted nested ``lax.scan`` of pure matmul steps — numerically the
same sequential-Adam trajectory, orders of magnitude less host/compile
overhead.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fcsr_tpu.core.normalize import normalize_adj, pad_hr_adj, unpad
from fcsr_tpu.models.gsr import GSRNet
from fcsr_tpu.train.losses import gsr_composite_loss

__all__ = ["GSRTrainConfig", "init_gsr", "precompute_spectral",
           "train_gsr_fold", "evaluate_gsr", "predict_gsr"]


@dataclass(frozen=True)
class GSRTrainConfig:
    """Hyperparameters of the shipped GSR-Net run
    (ref: training_gsr.ipynb cell-4 Args)."""
    epochs: int = 200
    lr: float = 1e-4
    lmbda: float = 16.0
    lr_dim: int = 160
    hr_dim: int = 268
    hidden_dim: int = 268
    padding: int = 0
    ks: Tuple[float, ...] = (0.9, 0.7, 0.6, 0.5)
    # fold the spectral-layer + decoder + loss forward/backward into one
    # Pallas kernel (see models/fused_tail.py); identical math, fewer ops
    fused_tail: bool = False
    # run the U-Net forward as one fused kernel too (rank-select
    # formulation, models/fused_step.py; XLA backward)
    fused_unet: bool = False
    # also run the U-Net BACKWARD as one kernel (hand-written
    # residual-based adjoints, models/fused_step.py::unet_fused_fwdbwd):
    # removes the rematerialized-forward + backward op-graph from the XLA
    # step. Gradients agree with the XLA backward to float-reassociation
    # level (~1e-6). Implies the fused forward; ignored if fused_unet=False.
    fused_unet_bwd: bool = False
    # the ENTIRE training step (U-Net fwd + spectral tail with in-kernel
    # AD + hand-written U-Net adjoints) as ONE Mosaic kernel
    # (models/fused_step.py::gsr_step_loss_fused): one launch per step
    # instead of three, residuals stay in VMEM. Same math as the
    # three-kernel path up to float reassociation. Takes precedence over
    # fused_tail/fused_unet/fused_unet_bwd in the fold-parallel trainer.
    fused_step: bool = False
    # the training step INCLUDING the (masked) Adam update as one kernel
    # (models/fused_step.py::train_step_fused): eliminates the flat-Adam
    # marshalling traffic around the step kernel. Elementwise-identical
    # Adam math — bit-exact vs fused_step (tested). Fastest measured
    # path (4.72 s steady under FCSR_MM_MODE=bf16, PERF.md); needs the
    # raised per-kernel VMEM cap the pallas_call sets itself.
    fused_adam: bool = False
    # NON-DEFAULT fast mode for the fold-parallel trainer: forward/backward
    # matmul operands in bfloat16 (f32 master params + f32 Adam + f32
    # accumulations stay). Quality delta measured in PERF.md; the default
    # f32 path and the fused bf16x3 kernels are trajectory-exact instead.
    compute_dtype: str = "f32"  # "f32" | "bf16"

    def model(self) -> GSRNet:
        return GSRNet(ks=self.ks, lr_dim=self.lr_dim, hr_dim=self.hr_dim,
                      hidden_dim=self.hidden_dim)


def init_gsr(cfg: GSRTrainConfig, key: jax.Array):
    """Initialize model params and Adam state (torch Adam defaults:
    b1=0.9, b2=0.999, eps=1e-8 — ref: training_gsr.ipynb cell-4)."""
    model = cfg.model()
    dummy = jnp.eye(cfg.lr_dim, dtype=jnp.float32)
    # dummy u_lr avoids tracing the in-forward eigh at init (slow compile)
    params = model.init(key, dummy, u_lr=dummy)
    tx = optax.adam(cfg.lr, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = tx.init(params)
    return model, params, tx, opt_state


def _spectral_cache_path(lr_np, hr_np, lr_dim, padding):
    """Disk-cache location for the spectral precompute, keyed by dataset
    CONTENT + config — or None when caching is disabled. Mirrors the
    reference's own preprocessed-tensor disk cache (ref:
    utils/slim.py:79-82); here it matters because host LAPACK over the
    full 167-subject set costs ~3 s on a fast host but ~54 s on a
    single-vCPU one (measured, round 4), and the teacher dataset is a
    fixed seeded artifact. Shared machinery in utils/host_cache.py."""
    from fcsr_tpu.utils.host_cache import cache_path
    return cache_path("spectral", (lr_np, hr_np), (lr_dim, padding))


def precompute_spectral(lr_stack, hr_stack, lr_dim: int = 160,
                        padding: int = 0, device: bool = False,
                        a_norm=None):
    """Batched eigendecompositions hoisted out of the train loop.

    Returns (u_lr, u_hr_reduced):
      u_lr          — eigenvectors of normalize_adj(lr) per subject
                      (what GSRLayer consumes, ref: models/layers.py:27)
      u_hr_reduced  — first lr_dim eigenvector columns of the padded HR
                      label (the spectral-loss target,
                      ref: utils/gsr_train.py:33-36)
    Exact hoisting: these depend only on data, never on parameters.

    Default backend is host LAPACK: this is one-shot data preprocessing
    (~3 s for the full 167-subject set on a fast host), and wrapping two
    batched eighs in a custom jit triggers a pathological multi-minute
    XLA TPU compile — measured 292 s vs 3 s of actual compute.
    ``device=True`` keeps it on the accelerator via the un-nested
    jnp.linalg.eigh fast path. Bonus: host numpy eigh uses the same
    LAPACK syevd backend (and thus eigenvector sign conventions) as
    torch.linalg.eigh in the reference.

    The host result is disk-cached per dataset content
    (``_spectral_cache_path``; disable with FCSR_NO_SPECTRAL_CACHE=1).
    ``a_norm`` optionally supplies the already-normalized LR stack so
    callers that need it anyway (stage_dataset) don't pay the
    normalization twice.
    """
    if device:
        a_norm = normalize_adj(lr_stack) if a_norm is None else a_norm
        _, u_lr = jnp.linalg.eigh(a_norm)
        hr_padded = pad_hr_adj(hr_stack, padding)
        _, u_hr = jnp.linalg.eigh(hr_padded)
        return u_lr, u_hr[..., :, :lr_dim]

    from fcsr_tpu.core.normalize import normalize_adj_np

    lr_np = np.asarray(lr_stack, dtype=np.float32)
    hr_np = np.asarray(hr_stack, dtype=np.float32)
    from fcsr_tpu.utils import host_cache
    cache = _spectral_cache_path(lr_np, hr_np, lr_dim, padding)
    hit = host_cache.load(cache, ("u_lr", "u_hr_reduced"))
    if hit is not None:
        return hit

    if a_norm is None:
        a_norm = normalize_adj_np(lr_np)
    _, u_lr = np.linalg.eigh(np.asarray(a_norm, dtype=np.float32))

    if padding:
        hr_np = np.pad(hr_np, ((0, 0), (padding, padding),
                               (padding, padding)))
    else:
        hr_np = hr_np.copy()
    n = hr_np.shape[-1]
    hr_np[:, np.arange(n), np.arange(n)] = 1.0
    _, u_hr = np.linalg.eigh(hr_np)
    u_hr_reduced = u_hr[..., :, :lr_dim]
    host_cache.save(cache, u_lr=u_lr, u_hr_reduced=u_hr_reduced)
    # return HOST arrays: transferring >2-D arrays here would hit the slow
    # tiled-relayout device_put path (see utils/transfer.py); callers stage
    # flat via device_put_fast.
    return u_lr, u_hr_reduced


def _loss_fn(params, model: GSRNet, lr, hr, u_lr, u_hr_red,
             lmbda: float, padding: int):
    pred, net_outs, start_outs, _ = model.apply(params, lr, u_lr=u_lr)
    pred = unpad(pred, padding)
    weights = params["params"]["layer"]["weights"]
    return gsr_composite_loss(pred, net_outs, start_outs, weights,
                              u_hr_red, hr, lmbda)


def make_train_fn(model: GSRNet, tx: optax.GradientTransformation,
                  cfg: GSRTrainConfig, per_step: bool = False):
    """Build the jitted whole-run trainer: nested scan (epochs x subjects)
    of per-sample Adam steps — the exact sequential update order of the
    reference (which iterates subjects in fixed order each epoch,
    ref: utils/gsr_train.py:23).

    ``per_step=True`` returns the raw (epochs, n_subjects) per-step loss /
    error histories instead of per-epoch means — the shape the
    weight-transplant parity harness compares step-by-step against the
    torch reference (tools/parity_vs_reference.py)."""

    loss_fn = partial(_loss_fn, model=model, lmbda=cfg.lmbda,
                      padding=cfg.padding)

    def sample_step(carry, batch):
        params, opt_state = carry
        lr, hr, u_lr, u_hr_red = batch
        (loss, err), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, lr=lr, hr=hr, u_lr=u_lr, u_hr_red=u_hr_red)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), (loss, err)

    @jax.jit
    def train_fn(params, opt_state, lr_stack, hr_stack, u_lr, u_hr_red):
        def epoch(carry, _):
            carry, stats = jax.lax.scan(
                sample_step, carry, (lr_stack, hr_stack, u_lr, u_hr_red))
            if per_step:
                return carry, stats
            return carry, (jnp.mean(stats[0]), jnp.mean(stats[1]))

        (params, opt_state), (loss_hist, err_hist) = jax.lax.scan(
            epoch, (params, opt_state), None, length=cfg.epochs)
        return params, opt_state, loss_hist, err_hist

    return train_fn


def train_gsr_fold(params, opt_state, model, tx, cfg: GSRTrainConfig,
                   lr_stack, hr_stack, spectral=None, verbose: bool = False):
    """Train on one fold's stacked arrays; returns updated (params,
    opt_state, history dict)."""
    from fcsr_tpu.utils.transfer import device_put_fast
    lr_np = np.asarray(lr_stack, dtype=np.float32)
    hr_np = np.asarray(hr_stack, dtype=np.float32)
    if spectral is None:
        spectral = precompute_spectral(lr_np, hr_np, lr_dim=cfg.lr_dim,
                                       padding=cfg.padding)
    u_lr, u_hr_red = (device_put_fast(np.asarray(s, dtype=np.float32))
                      for s in spectral)
    lr_stack = device_put_fast(lr_np)
    hr_stack = device_put_fast(hr_np)
    train_fn = make_train_fn(model, tx, cfg)
    params, opt_state, loss_hist, err_hist = train_fn(
        params, opt_state, lr_stack, hr_stack, u_lr, u_hr_red)
    if verbose:
        for e in range(cfg.epochs):
            print(f"Epoch: {e + 1}, Loss: {loss_hist[e]:.6f}, "
                  f"Error (MAE): {err_hist[e]:.6f}")
    history = {"loss": np.asarray(loss_hist), "error": np.asarray(err_hist)}
    return params, opt_state, history


@partial(jax.jit, static_argnames=("model", "padding"))
def _batched_predict(params, model: GSRNet, lr_stack, u_lr, padding: int):
    def fwd(lr, u):
        pred, _, _, _ = model.apply(params, lr, u_lr=u)
        return unpad(pred, padding)
    return jax.vmap(fwd)(lr_stack, u_lr)


def predict_gsr(params, model: GSRNet, cfg: GSRTrainConfig, lr_stack):
    """Batched inference over a stack of LR connectomes -> HR predictions."""
    from fcsr_tpu.core.normalize import normalize_adj_np
    from fcsr_tpu.utils.transfer import device_put_fast
    lr_np = np.asarray(lr_stack, dtype=np.float32)
    _, u_lr = np.linalg.eigh(normalize_adj_np(lr_np))
    return _batched_predict(params, model, device_put_fast(lr_np),
                            device_put_fast(u_lr.astype(np.float32)),
                            padding=cfg.padding)


def evaluate_gsr(params, model: GSRNet, cfg: GSRTrainConfig,
                 lr_stack, hr_stack, verbose: bool = False):
    """Validation pass mirroring the reference's ``test``
    (ref: utils/gsr_train.py:55-85): skip all-zero subjects, fill the HR
    diagonal with 1 before comparing, report per-sample and mean MAE.
    Forward runs batched on device; returns (mean_mae, preds, gts)."""
    lr_np = np.asarray(lr_stack)
    hr_np = np.asarray(hr_stack)
    keep = [i for i in range(len(lr_np))
            if lr_np[i].any() and hr_np[i].any()]
    lr_np, hr_np = lr_np[keep], hr_np[keep]

    preds = np.asarray(predict_gsr(params, model, cfg, lr_np))
    hr_eval = hr_np.copy()
    for m in hr_eval:
        np.fill_diagonal(m, 1.0)
    per_sample = np.abs(preds - hr_eval).mean(axis=(1, 2))
    if verbose:
        for e in per_sample:
            print(f"MAE: {e}")
        print(f"Test error MAE: {per_sample.mean()}")
    return float(per_sample.mean()), preds, hr_eval
