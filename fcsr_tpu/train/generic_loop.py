"""Generic batched training loop (MLP & friends).

Replicates the semantics of the reference's ``train_model``
(ref: utils/training.py:20-155): AdamW, ReduceLROnPlateau (torch
semantics), global-norm grad clip 1.0, per-epoch validation, best-val
checkpoint restore, early stop when lr < 1e-5.

**Control runs ON DEVICE by default** (round 3): the plateau scheduler,
best-state snapshot and early-stop mask are lax.scan carry inside a
chunked compiled program, with per-epoch shuffle plans pregenerated on
the host from the SAME RNG sequence the legacy host loop draws — the
two paths are trajectory-identical (tested). The host loop made ~1
blocking device round trip per epoch; over a high-latency link that
round-trip cost dominated the whole MLP family wall clock (the
430-830 s "cold compile" of round 2 was actually this — the programs
themselves compile in ~5 s, measured in
tools/experiments/mlp_compile_breakdown.py). The on-device path makes
one scalar pull per ``control_chunk_epochs`` epochs plus one bulk pull
at the end. ``host_control=True`` keeps the legacy loop.

Divergence (documented): the reference's loader reports ``len = n //
batch_size`` but iterates ceil(n / batch_size) batches, so its logged
average loss is slightly inflated (ref: utils/data.py:77-86 vs
utils/training.py:110); we average over the true batch count.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["PlateauScheduler", "TrainState", "train_model",
           "train_model_folds", "mse_criterion"]


class PlateauScheduler:
    """torch.optim.lr_scheduler.ReduceLROnPlateau (mode='min') semantics:
    relative-threshold improvement tracking, patience epochs, multiplicative
    factor decay (ref defaults: utils/training.py:70-72 — patience=10;
    unet variant: threshold=1e-2, factor=0.1)."""

    def __init__(self, lr: float, patience: int = 10, factor: float = 0.1,
                 threshold: float = 1e-4, threshold_mode: str = "rel",
                 min_lr: float = 0.0):
        self.lr = lr
        self.patience = patience
        self.factor = factor
        self.threshold = threshold
        self.threshold_mode = threshold_mode
        self.min_lr = min_lr
        self.best = float("inf")
        self.num_bad = 0

    def _is_better(self, metric: float) -> bool:
        if self.threshold_mode == "rel":
            return metric < self.best * (1.0 - self.threshold)
        return metric < self.best - self.threshold

    def step(self, metric: float) -> float:
        if self._is_better(metric):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.num_bad = 0
        return self.lr


@dataclass
class TrainState:
    variables: dict          # {'params', optional 'batch_stats', ...}
    opt_state: optax.OptState


def mse_criterion(pred, target):
    return jnp.mean((pred - target) ** 2)


def _make_step_fns(model, tx, criterion: Callable, mutable_cols):
    """Step program BODIES (unjitted — the host-control path jits them,
    the device-control path embeds them in its epoch scan). The dataset
    stays DEVICE-RESIDENT (shipped once, flat-staged — see
    utils/transfer.py for why >2-D transfers must not cross the tunnel
    per batch); per-epoch sample selection is an integer gather inside
    the compiled programs, so only the small 2-D index plans ship."""

    def train_step_body(variables, opt_state, lr_b, hr_b, dropout_key):
        params = variables["params"]
        aux_cols = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(params):
            outs = model.apply({"params": params, **aux_cols}, lr_b,
                               train=True, mutable=list(mutable_cols),
                               rngs={"dropout": dropout_key})
            pred, new_aux = outs
            return criterion(pred, hr_b), new_aux

        (loss, new_aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return {"params": params, **new_aux}, opt_state, loss

    def train_step(variables, opt_state, lr_all, hr_all, idx, dropout_key):
        return train_step_body(variables, opt_state, lr_all[idx],
                               hr_all[idx], dropout_key)

    def train_epoch_full(variables, opt_state, lr_all, hr_all, idxs,
                         dropout_key):
        """All FULL batches of one epoch as a single lax.scan — one
        dispatch instead of one per batch. The ragged remainder batch (if
        any) goes through ``train_step`` separately so BatchNorm sees the
        exact per-batch statistics the reference's loader produces."""
        def step(carry, idx):
            variables, opt_state, key = carry
            key, sub = jax.random.split(key)
            variables, opt_state, loss = train_step_body(
                variables, opt_state, lr_all[idx], hr_all[idx], sub)
            return (variables, opt_state, key), loss

        (variables, opt_state, _), losses = jax.lax.scan(
            step, (variables, opt_state, dropout_key), idxs)
        return variables, opt_state, losses

    def eval_step(variables, lr_b, hr_b):
        pred = model.apply(variables, lr_b, train=False)
        return criterion(pred, hr_b), pred

    return train_step, train_epoch_full, eval_step


def _control_program_parts(model, criterion: Callable,
                           mutable_cols, lr0: float,
                           batch_size: int, n: int,
                           patience: int, plateau_threshold: float,
                           plateau_factor: float, clip_norm: float,
                           weight_decay: float,
                           min_lr_stop: float):
    """UNJITTED chunked control program body + its optimizer — the
    single-run path jits it directly, the fold-parallel path jits a
    vmap of it. ``criterion`` must be a stable function object
    (module-level, or from the lru_cached ``make_triu_mse_criterion``)."""
    def tx_factory(learning_rate):
        return optax.chain(
            optax.clip_by_global_norm(clip_norm),
            optax.adamw(learning_rate=learning_rate, b1=0.9, b2=0.999,
                        eps=1e-8, weight_decay=weight_decay))

    # lr is optimizer STATE (inject_hyperparams): plateau decays update a
    # traced scalar instead of rebuilding + re-jitting the step programs
    tx = optax.inject_hyperparams(tx_factory)(learning_rate=lr0)
    train_step, train_epoch_full, eval_step = _make_step_fns(
        model, tx, criterion, mutable_cols)
    n_full = n // batch_size
    n_rem = n % batch_size

    def set_lr(opt_state, new_lr):
        return opt_state._replace(hyperparams={
            **opt_state.hyperparams,
            "learning_rate": jnp.asarray(new_lr, jnp.float32)})

    def masked_select(flag, new, old):
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(flag > 0, a, b), new, old)

    def run_chunk(carry, perms_c, do_val_c, lr_train_d, hr_train_d,
                  lr_val, hr_val):
        """``perms_c``: (chunk, n) int32 shuffled index plans;
        ``do_val_c``: (chunk,) f32 validate-this-epoch flags. Carry holds
        the FULL control state."""
        def one_epoch(carry, xs):
            (variables, opt_state, key, cur_lr, active, sbest, nbad,
             bval, best_vars) = carry
            perm, do_val = xs

            # run the epoch unconditionally; discard results when the
            # run has already early-stopped (masked select below)
            v_new, o_new, key_new = variables, opt_state, key
            losses = []
            if n_full:
                idx = perm[:n_full * batch_size].reshape(n_full,
                                                         batch_size)
                key_new, sub = jax.random.split(key_new)
                v_new, o_new, full_losses = train_epoch_full(
                    v_new, o_new, lr_train_d, hr_train_d, idx, sub)
                losses.append(full_losses)
            if n_rem:
                idx = perm[n_full * batch_size:]
                key_new, sub = jax.random.split(key_new)
                v_new, o_new, rem_loss = train_step(
                    v_new, o_new, lr_train_d, hr_train_d, idx, sub)
                losses.append(rem_loss[None])
            tr_loss = jnp.mean(jnp.concatenate(losses))
            # validation forward only on validate epochs (lax.cond is a
            # real branch here — no fold vmap in this trainer); the inf
            # placeholder never surfaces: upd gates every consumer and
            # the host-side history filter drops unflagged epochs
            vloss = jax.lax.cond(
                do_val > 0,
                lambda v: eval_step(v, lr_val, hr_val)[0],
                lambda v: jnp.asarray(jnp.inf, jnp.float32), v_new)

            act = active > 0
            upd = act & (do_val > 0)
            # torch ReduceLROnPlateau(mode='min') — PlateauScheduler.step
            is_better = vloss < sbest * (1.0 - plateau_threshold)
            sbest2 = jnp.where(is_better, vloss, sbest)
            nbad2 = jnp.where(is_better, 0, nbad + 1)
            decay = nbad2 > patience
            lr2 = jnp.where(decay, cur_lr * plateau_factor, cur_lr)
            nbad2 = jnp.where(decay, 0, nbad2)
            sbest2 = jnp.where(upd, sbest2, sbest)
            nbad2 = jnp.where(upd, nbad2, nbad)
            lr2 = jnp.where(upd, lr2, cur_lr)
            o_new = set_lr(o_new, lr2)

            improved = upd & (vloss < bval)
            bval2 = jnp.where(improved, vloss, bval)
            best2 = masked_select(improved, v_new, best_vars)
            active2 = jnp.where(upd & (lr2 < min_lr_stop), 0.0, active)

            variables = masked_select(act, v_new, variables)
            opt_state = masked_select(act, o_new, opt_state)
            # keys advance only while active (matches the host loop's
            # per-epoch split choreography)
            key = masked_select(act, key_new, key)
            # ``active`` at epoch START = the epochs the host loop logs
            hist = (tr_loss, vloss, lr2, active)
            return (variables, opt_state, key, lr2, active2, sbest2,
                    nbad2, bval2, best2), hist

        carry, hists = jax.lax.scan(one_epoch, carry, (perms_c, do_val_c))
        return carry, hists

    return run_chunk, tx


@lru_cache(maxsize=32)
def _build_device_control_program(model, criterion: Callable,
                                  mutable_cols, lr0: float,
                                  batch_size: int, n: int,
                                  patience: int, plateau_threshold: float,
                                  plateau_factor: float, clip_norm: float,
                                  weight_decay: float,
                                  min_lr_stop: float):
    """Jitted chunked control program + its optimizer, cached per
    (model/criterion/schedule/shape) config so repeat ``train_model``
    calls (per-fold loops, benches) reuse ONE compiled executable
    instead of re-tracing a fresh closure every call."""
    run_chunk, tx = _control_program_parts(
        model, criterion, mutable_cols, lr0, batch_size, n, patience,
        plateau_threshold, plateau_factor, clip_norm, weight_decay,
        min_lr_stop)
    return _aot(("single", model, criterion, mutable_cols, lr0,
                 batch_size, n, patience, plateau_threshold,
                 plateau_factor, clip_norm, weight_decay, min_lr_stop),
                jax.jit(run_chunk)), tx


def _aot(key_parts, jit_fn):
    """AOT executable disk cache over a control program (see
    utils/aot_cache.py — skips the client lower+compile in a fresh
    process; plain jit on any failure). Every Python value baked into
    the traced program must appear in the tag; argument shapes/dtypes
    are keyed by the wrapper itself."""
    from fcsr_tpu.utils.aot_cache import callable_id, wrap
    parts = [callable_id(p) if callable(p) and not hasattr(p, "apply")
             else repr(p) for p in key_parts]
    return wrap("mlp_chunk|" + "|".join(parts), jit_fn)


@lru_cache(maxsize=32)
def _build_fold_control_program(model, criterion: Callable,
                                mutable_cols, lr0: float,
                                batch_size: int, n: int,
                                patience: int, plateau_threshold: float,
                                plateau_factor: float, clip_norm: float,
                                weight_decay: float,
                                min_lr_stop: float):
    """Fold-parallel control program: the SAME chunk body vmapped over a
    leading fold axis of the carry, the shuffle plans and the data
    stacks (validate flags are epoch-indexed, hence shared). One
    dispatch drives every fold's control state for a whole epoch chunk —
    k-fold CV is embarrassingly parallel, and over a high-latency
    device link the sequential path's per-fold dispatches dominate the
    whole MLP family wall clock (PERF.md round 4)."""
    run_chunk, tx = _control_program_parts(
        model, criterion, mutable_cols, lr0, batch_size, n, patience,
        plateau_threshold, plateau_factor, clip_norm, weight_decay,
        min_lr_stop)
    return _aot(("folds", model, criterion, mutable_cols, lr0,
                 batch_size, n, patience, plateau_threshold,
                 plateau_factor, clip_norm, weight_decay, min_lr_stop),
                jax.jit(jax.vmap(run_chunk,
                                 in_axes=(0, 0, None, 0, 0, 0, 0)))), tx


def train_model(model, variables, lr_train, hr_train, lr_val, hr_val,
                num_epochs: int = 100, lr: float = 0.01,
                batch_size: int = 32, validate_every: int = 1,
                patience: int = 10, plateau_threshold: float = 1e-4,
                plateau_factor: float = 0.1, clip_norm: float = 1.0,
                weight_decay: float = 0.01,
                criterion: Callable = mse_criterion,
                min_lr_stop: float = 1e-5, seed: int = 0,
                verbose: bool = False, logger=None,
                host_control: bool = False,
                control_chunk_epochs: int = 25):
    """Train a batched flax model; returns
    (train_hist, val_hist, lr_hist, best_variables) with the model's best
    validation state restored, mirroring the reference's return contract
    (ref: utils/training.py:151-155)."""
    from fcsr_tpu.utils.transfer import device_put_fast

    # ship the full (n, N, N) stacks ONCE, flat-staged; batches are
    # gathered on device (>2-D per-epoch transfers stall/crash the
    # tunnelled TPU runtime — utils/transfer.py)
    lr_train_d = device_put_fast(np.asarray(lr_train, dtype=np.float32))
    hr_train_d = device_put_fast(np.asarray(hr_train, dtype=np.float32))
    lr_val = device_put_fast(np.asarray(lr_val, dtype=np.float32))
    hr_val = device_put_fast(np.asarray(hr_val, dtype=np.float32))

    mutable_cols = tuple(sorted(k for k in variables if k != "params"))

    n = len(np.asarray(lr_train))
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    n_full = n // batch_size

    def validate_flag(epoch):
        return ((epoch + 1) % validate_every == 0
                or (epoch + 1) == num_epochs)

    if host_control:
        def tx_factory(learning_rate):
            return optax.chain(
                optax.clip_by_global_norm(clip_norm),
                optax.adamw(learning_rate=learning_rate, b1=0.9,
                            b2=0.999, eps=1e-8,
                            weight_decay=weight_decay))

        tx = optax.inject_hyperparams(tx_factory)(learning_rate=lr)
        opt_state = tx.init(variables["params"])
        train_step, train_epoch_full, eval_step = _make_step_fns(
            model, tx, criterion, mutable_cols)
        return _train_model_host(
            model, variables, opt_state, tx, train_step, train_epoch_full,
            eval_step, lr_train_d, hr_train_d, lr_val, hr_val, num_epochs,
            lr, batch_size, validate_flag, patience, plateau_threshold,
            plateau_factor, min_lr_stop, rng, key, n, n_full, verbose,
            logger)

    # ---- on-device control (default) ----------------------------------
    chunk_fn, tx = _build_device_control_program(
        model, criterion, mutable_cols, float(lr), int(batch_size),
        int(n), int(patience), float(plateau_threshold),
        float(plateau_factor), float(clip_norm), float(weight_decay),
        float(min_lr_stop))
    opt_state = tx.init(variables["params"])
    carry = (variables, opt_state, key,
             jnp.asarray(lr, jnp.float32),
             jnp.asarray(1.0, jnp.float32),
             jnp.asarray(jnp.inf, jnp.float32),
             jnp.asarray(0, jnp.int32),
             jnp.asarray(jnp.inf, jnp.float32),
             variables)
    hist_parts, val_flags = [], []
    done = 0
    while done < num_epochs:
        chunk = min(control_chunk_epochs, num_epochs - done)
        perms = np.stack([rng.permutation(n).astype(np.int32)
                          for _ in range(chunk)])
        flags = np.asarray([1.0 if validate_flag(done + e) else 0.0
                            for e in range(chunk)], np.float32)
        carry, hists_c = chunk_fn(carry, jnp.asarray(perms),
                                  jnp.asarray(flags), lr_train_d,
                                  hr_train_d, lr_val, hr_val)
        hist_parts.append(hists_c)
        val_flags.append(flags)
        done += chunk
        if float(carry[4]) == 0.0:  # ONE scalar pull per chunk
            break

    tr_h, v_h, lr_h, act_h = (np.concatenate(
        [np.asarray(h[i]) for h in hist_parts]) for i in range(4))
    flags = np.concatenate(val_flags)[:len(tr_h)]
    (variables, _, _, _, _, _, _, bval_d, best_vars) = carry

    mask = act_h > 0
    train_hist = [float(x) for x in tr_h[mask]]
    vmask = mask & (flags > 0)
    val_hist = [float(x) for x in v_h[vmask]]
    lr_hist = [float(x) for x in lr_h[vmask]]
    if logger is not None or verbose:
        vi = 0
        for e in range(int(mask.sum())):
            vloss = val_hist[vi] if flags[e] > 0 else None
            cur = lr_hist[vi] if flags[e] > 0 else (
                lr_hist[vi - 1] if vi else lr)
            if flags[e] > 0:
                vi += 1
            if logger is not None:
                logger.log("epoch", epoch=e + 1, train_loss=train_hist[e],
                           val_loss=vloss, lr=cur)
            if verbose:
                print(f"epoch {e + 1}: train {train_hist[e]:.6f} "
                      f"val {vloss if vloss is not None else float('nan'):.6f} "
                      f"lr {cur:.2e}")

    # NaN-robust fallback mirroring the host loop: if no epoch ever
    # improved (bval still inf), keep the final variables
    if np.isfinite(float(bval_d)):
        variables = best_vars
    return train_hist, val_hist, lr_hist, variables


def train_model_folds(model, variables_stack, lr_train_f, hr_train_f,
                      lr_val_f, hr_val_f, seeds,
                      num_epochs: int = 100, lr: float = 0.01,
                      batch_size: int = 32, validate_every: int = 1,
                      patience: int = 10, plateau_threshold: float = 1e-4,
                      plateau_factor: float = 0.1, clip_norm: float = 1.0,
                      weight_decay: float = 0.01,
                      criterion: Callable = mse_criterion,
                      min_lr_stop: float = 1e-5,
                      control_chunk_epochs: int = 25,
                      return_stacked: bool = False):
    """Train F independent folds of one model config as ONE vmapped
    device-control program — the generic-loop analog of
    ``fast_loop.GSRFoldRunner``'s fold axis.

    Inputs carry a leading fold axis: ``variables_stack`` is the F
    per-fold init trees stacked leaf-wise, ``*_f`` arrays are
    (F, n, ...) data stacks (train/val sizes must be EQUAL across
    folds — contiguous-window folds are; ragged k-fold splits must use
    sequential ``train_model``), ``seeds`` is the per-fold seed list
    (drives both the shuffle plans and the dropout key, exactly like
    the sequential path's ``seed`` argument).

    Trajectory-equivalent to F sequential ``train_model`` calls up to
    float reassociation of the vmapped matmuls (tested); the win is
    dispatch count: one chunk dispatch + one scalar pull drive ALL
    folds for ``control_chunk_epochs`` epochs, where the sequential
    path pays that per fold — the dominant cost over a high-latency
    device link (PERF.md round 4).

    Returns a list of F ``(train_hist, val_hist, lr_hist,
    best_variables)`` tuples, each identical in contract to
    ``train_model``'s return. With ``return_stacked=True`` returns
    ``(results, best_stack)`` where ``best_stack`` is the same per-fold
    best-or-final selection as a device-resident STACKED tree — callers
    can feed it straight into a vmapped evaluation program without F
    tree-unstack dispatch rounds.
    """
    from fcsr_tpu.utils.transfer import (device_put_fast,
                                         device_put_tree_fast, stage_cached)

    n_folds = len(seeds)
    n = int(np.asarray(lr_train_f).shape[1])

    # content-memoized staging: repeat calls on the same data (bench
    # steady passes, repeat CV runs in one process) ship nothing
    lr_train_d = stage_cached(np.asarray(lr_train_f, dtype=np.float32))
    hr_train_d = stage_cached(np.asarray(hr_train_f, dtype=np.float32))
    lr_val_d = stage_cached(np.asarray(lr_val_f, dtype=np.float32))
    hr_val_d = stage_cached(np.asarray(hr_val_f, dtype=np.float32))

    # stacked param leaves are >2-D AND numerous; ship the whole tree as
    # one flat buffer (utils/transfer.py module docstring), content-
    # memoized for the same repeat-pass reason (inits are seeded).
    # Already-device-resident trees (callers caching their staged init
    # stack, e.g. pipelines._mlp_init_stack) pass through untouched —
    # pulling them back to host would cost a full round trip plus this
    # VM's ~120 MB/s large-copy bandwidth.
    dev0 = jax.devices()[0]
    leaves = jax.tree_util.tree_leaves(variables_stack)
    if not all(isinstance(lf, jax.Array) and lf.devices() == {dev0}
               for lf in leaves):
        variables_stack = jax.tree_util.tree_map(
            np.asarray, variables_stack)
        variables_stack = device_put_tree_fast(variables_stack, cache=True)

    sample = jax.tree_util.tree_leaves(variables_stack)[0]
    assert sample.shape[0] == n_folds, "variables_stack fold axis mismatch"
    mutable_cols = tuple(sorted(
        k for k in variables_stack if k != "params"))

    chunk_fn, tx = _build_fold_control_program(
        model, criterion, mutable_cols, float(lr), int(batch_size),
        n, int(patience), float(plateau_threshold), float(plateau_factor),
        float(clip_norm), float(weight_decay), float(min_lr_stop))
    opt_state = jax.jit(jax.vmap(tx.init))(variables_stack["params"])

    rngs = [np.random.default_rng(s) for s in seeds]
    keys = jnp.stack([jax.random.PRNGKey(s) for s in seeds])

    def rep(x, dtype):
        return jnp.full((n_folds,), x, dtype)

    carry = (variables_stack, opt_state, keys,
             rep(lr, jnp.float32), rep(1.0, jnp.float32),
             rep(jnp.inf, jnp.float32), rep(0, jnp.int32),
             rep(jnp.inf, jnp.float32), variables_stack)

    def validate_flag(epoch):
        return ((epoch + 1) % validate_every == 0
                or (epoch + 1) == num_epochs)

    hist_parts, val_flags = [], []
    done = 0
    while done < num_epochs:
        chunk = min(control_chunk_epochs, num_epochs - done)
        perms = np.stack([
            np.stack([rng.permutation(n).astype(np.int32)
                      for _ in range(chunk)]) for rng in rngs])
        flags = np.asarray([1.0 if validate_flag(done + e) else 0.0
                            for e in range(chunk)], np.float32)
        carry, hists_c = chunk_fn(carry, device_put_fast(perms),
                                  jnp.asarray(flags), lr_train_d,
                                  hr_train_d, lr_val_d, hr_val_d)
        hist_parts.append(hists_c)
        val_flags.append(flags)
        done += chunk
        if float(jnp.max(carry[4])) == 0.0:  # ONE scalar pull per chunk
            break

    # hists parts are (F, chunk, ...) — one bulk pull, then concatenate
    # on the epoch axis
    hist_parts = jax.device_get(hist_parts)
    tr_h, v_h, lr_h, act_h = (np.concatenate(
        [np.asarray(h[i]) for h in hist_parts], axis=1) for i in range(4))
    flags = np.concatenate(val_flags)[:tr_h.shape[1]]
    (variables_f, _, _, _, _, _, _, bval_f, best_f) = carry
    # per-fold best-or-final selection as ONE device program (a fold
    # that never recorded a finite val loss keeps its final params —
    # mirrors the sequential path's fallback)
    sel_stack = _select_best_stack(best_f, variables_f, bval_f)

    results = []
    for j in range(n_folds):
        mask = act_h[j] > 0
        vmask = mask & (flags > 0)
        train_hist = [float(x) for x in tr_h[j][mask]]
        val_hist = [float(x) for x in v_h[j][vmask]]
        lr_hist = [float(x) for x in lr_h[j][vmask]]
        fold_vars = jax.tree_util.tree_map(lambda x: x[j], sel_stack)
        results.append((train_hist, val_hist, lr_hist, fold_vars))
    if return_stacked:
        return results, sel_stack
    return results


@jax.jit
def _select_best_stack(best_f, variables_f, bval_f):
    """Per-fold where(best-val-seen, best, final) over stacked trees."""
    finite = jnp.isfinite(bval_f)
    return jax.tree_util.tree_map(
        lambda b, v: jnp.where(
            finite.reshape((-1,) + (1,) * (b.ndim - 1)), b, v),
        best_f, variables_f)


def _train_model_host(model, variables, opt_state, tx, train_step,
                      train_epoch_full, eval_step, lr_train_d, hr_train_d,
                      lr_val, hr_val, num_epochs, lr, batch_size,
                      validate_flag, patience, plateau_threshold,
                      plateau_factor, min_lr_stop, rng, key, n, n_full,
                      verbose, logger):
    """Legacy per-epoch host-control loop (one device pull per epoch)."""
    train_step = jax.jit(train_step)
    train_epoch_full = jax.jit(train_epoch_full)
    eval_step = jax.jit(eval_step)
    scheduler = PlateauScheduler(lr, patience=patience,
                                 factor=plateau_factor,
                                 threshold=plateau_threshold)
    cur_lr = lr
    train_hist, val_hist, lr_hist = [], [], []
    best_val = float("inf")
    best_variables = None

    for epoch in range(num_epochs):
        order = rng.permutation(n)
        validate = validate_flag(epoch)
        # dispatch every program of the epoch WITHOUT blocking, then pull
        # all scalars in one device round trip — the loop is otherwise
        # tunnel-latency-bound at ~1 s/epoch (3 blocking pulls)
        losses_d = rem_d = vloss_d = None
        if n_full:
            idx = order[:n_full * batch_size].reshape(n_full, batch_size)
            key, sub = jax.random.split(key)
            variables, opt_state, losses_d = train_epoch_full(
                variables, opt_state, lr_train_d, hr_train_d,
                jnp.asarray(idx.astype(np.int32)), sub)
        if n % batch_size:
            idx = order[n_full * batch_size:]
            key, sub = jax.random.split(key)
            variables, opt_state, rem_d = train_step(
                variables, opt_state, lr_train_d, hr_train_d,
                jnp.asarray(idx.astype(np.int32)), sub)
        if validate:
            vloss_d, _ = eval_step(variables, lr_val, hr_val)

        # pack into one device array -> ONE host pull per epoch
        parts = [p for p in (
            losses_d,
            rem_d[None] if rem_d is not None else None,
            vloss_d[None] if vloss_d is not None else None) if p is not None]
        packed = np.asarray(jnp.concatenate(parts))
        n_rem = 1 if rem_d is not None else 0
        n_tr = len(packed) - n_rem - (1 if vloss_d is not None else 0)
        epoch_losses = packed[:n_tr + n_rem].tolist()
        train_hist.append(float(np.mean(epoch_losses)))

        if validate:
            vloss = float(packed[-1])
            val_hist.append(vloss)
            new_lr = scheduler.step(vloss)
            if new_lr != cur_lr:
                # plateau fired: rebuild the InjectHyperparamsState with
                # the decayed lr (functional — no reliance on optax
                # exposing a mutable dict), still no re-jit
                cur_lr = new_lr
                opt_state = opt_state._replace(hyperparams={
                    **opt_state.hyperparams,
                    "learning_rate": jnp.asarray(cur_lr, jnp.float32)})
            lr_hist.append(cur_lr)

            if vloss < best_val:
                best_val = vloss
                best_variables = jax.tree_util.tree_map(
                    lambda x: np.asarray(x), variables)
            if cur_lr < min_lr_stop:
                break
        # log None on non-validate epochs (matching the device-control
        # path) — reporting the previous validated loss as this epoch's
        # would be stale telemetry
        vloss_log = vloss if validate and val_hist else None
        if logger is not None:
            logger.log("epoch", epoch=epoch + 1,
                       train_loss=train_hist[-1],
                       val_loss=vloss_log,
                       lr=cur_lr)
        if verbose:
            print(f"epoch {epoch + 1}: train {train_hist[-1]:.6f} "
                  f"val {vloss_log if vloss_log is not None else float('nan'):.6f} "
                  f"lr {cur_lr:.2e}")

    if best_variables is not None:
        variables = jax.tree_util.tree_map(jnp.asarray, best_variables)
    return train_hist, val_hist, lr_hist, variables
