"""Training loop for the GAT Graph-U-Net family
(ref: unet-transformer.py:54-197, 478-541).

TPU restructuring mirrors the GSR loop: the per-sample (batch size 1)
Python loop becomes a jitted ``lax.scan`` over a shuffled index plan, and
the SVD node features — pure data (ref: unet-transformer.py:313-317,329) —
are precomputed batched instead of re-decomposed every forward.

Fixed reference bug (documented divergence): best-model selection used
``val_loss > best_val_loss`` (ref: unet-transformer.py:182), which keeps the
WORST epoch; we keep the best.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from types import SimpleNamespace
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fcsr_tpu.models.gat_unet import GATGraphUnet
from fcsr_tpu.train.generic_loop import PlateauScheduler
from fcsr_tpu.train.losses import intermediate_recon_loss, offdiag_mse_loss

__all__ = ["GATTrainConfig", "init_gat", "precompute_gat_features",
           "train_gat", "train_gat_folds_parallel", "adamw_flat_update",
           "predict_gat", "unet_loss"]


@dataclass(frozen=True)
class GATTrainConfig:
    """The shipped unet-transformer run (ref: unet-transformer.py:503-524)."""
    ks: Tuple[float, ...] = (0.5, 0.5, 0.5)
    n_nodes: int = 160
    m_nodes: int = 268
    dim: int = 16
    heads: int = 4
    drop_p: float = 0.01
    skip: bool = False
    epochs: int = 100
    lr: float = 1e-3
    patience: int = 10
    plateau_threshold: float = 1e-2
    plateau_factor: float = 0.1
    intermediate_losses: bool = True
    weight_decay: float = 0.01
    # scan unroll for the fold-parallel trainer's per-epoch step loop.
    # Exact math either way (fold MAEs bit-identical; measured on v5e,
    # PERF.md "GAT cold start"): unroll=1 halves the chunk program, so
    # the tunnelled runtime's per-process program load — the dominant
    # cold cost — drops with it: cold 67-90 s -> 31-52 s at the price of
    # ~1-2 s steady (5.5-6.7 -> 6.7-8.0 s for 3x100ep). The reference's
    # own usage is one-shot cold CV runs (unet-transformer.py:478-541),
    # so 1 is the default; set 2 for repeat-run/serving processes where
    # steady dominates.
    scan_unroll: int = 1
    # run each training step (fwd + bwd + masked AdamW) as ONE Mosaic
    # kernel (models/fused_gat.py) in the fold-parallel trainer. Same
    # math as the op-graph path up to the compensated-matmul accuracy
    # class (tested at drop_p=0); dropout uses the in-kernel PRNG, so
    # with drop_p > 0 trajectories are stochastically equivalent, not
    # bitwise. Measured on v5e: see PERF.md.
    fused_step: bool = False
    # run all heads' softmax elementwise chains as one (n, heads*n)
    # chain inside the fused kernel (models/fused_gat.py::
    # _gat_layer_batched). Mathematically identical (row-global softmax
    # shift cancels per block); FP-reassociation-level different.
    # Measured on v5e: see PERF.md "GAT-specific kernel findings".
    fused_batched_chain: bool = False
    # with fused_step, also run the per-subject validation forward
    # (loss + off-diag MAE) as one Mosaic kernel (fused_gat.gat_val_fused)
    # instead of the unfused flax forward. Equal to the unfused val to FP
    # reassociation (tested); dominant per-epoch cost once steps are fused.
    fused_val: bool = True

    def model(self) -> GATGraphUnet:
        return GATGraphUnet(ks=self.ks, n_nodes=self.n_nodes,
                            m_nodes=self.m_nodes, dim=self.dim,
                            heads=self.heads, drop_p=self.drop_p,
                            skip=self.skip)


def init_gat(cfg: GATTrainConfig, key: jax.Array):
    """The learning rate is injected as OPTIMIZER STATE
    (optax.inject_hyperparams) so plateau decays update a traced scalar
    instead of rebuilding + re-jitting the whole epoch program — the
    re-compile per decay was the dominant cost of the original loop."""
    from fcsr_tpu.utils.transfer import init_on_host

    model = cfg.model()

    def _init():
        dummy = jnp.eye(cfg.n_nodes, dtype=jnp.float32) * 0.5
        # rebase the (possibly device-resident) key on the host so the
        # split and every downstream init op stay on the CPU backend
        k_init, k_drop = jax.random.split(jnp.asarray(np.asarray(key)))
        return model.init({"params": k_init, "dropout": k_drop}, dummy)

    # host-CPU init: eager init over the TPU tunnel is ~5 s of per-op
    # round trips (tools/experiments/gat_fixed_cost.py)
    variables = init_on_host(_init)
    tx = optax.inject_hyperparams(optax.adamw)(
        learning_rate=cfg.lr, b1=0.9, b2=0.999, eps=1e-8,
        weight_decay=cfg.weight_decay)
    opt_state = tx.init(variables["params"])
    return model, variables, tx, opt_state


_FEATURE_CACHE: dict = {}
_INIT_FLAT_CACHE: dict = {}


def stage_lr_cached(lr_np):
    """Device-stage an LR stack, memoized per dataset bytes — the
    fold-parallel trainer and the prediction pass both need the same
    ~17 MB stack on device, and re-shipping it over the tunnelled
    runtime is a fixed cost the module's own comments call dominant.
    (Now the generic ``utils/transfer.py::stage_cached``.)"""
    from fcsr_tpu.utils.transfer import stage_cached
    return stage_cached(np.ascontiguousarray(lr_np, dtype=np.float32))


def precompute_gat_features(lr_stack, dim: int):
    """Batched SVD node features of the normalized (A + I) adjacencies —
    exactly what the reference recomputes inside every forward
    (ref: unet-transformer.py:313-317,324-329).

    Computed with host LAPACK: this is one-shot data preprocessing, and
    linalg decompositions nested inside custom jits trigger multi-minute
    XLA TPU compiles (same pathology as eigh, see gsr_loop.py). numpy's
    gesdd also matches torch.svd's sign conventions more closely than
    XLA's SVD.

    Results are memoized per (dataset content, dim) in-process — the
    ~5 s LAPACK pass on the 167-subject stack is pure preprocessing, and
    the reference itself caches preprocessed tensors on disk
    (utils/slim.py:79-82); repeat runs on the same stack reuse the
    device-resident features. A disk layer underneath
    (utils/host_cache.py, same switches as the GSR spectral cache)
    hands the ~1.7 MB feature stack to fresh processes too."""
    lr_host = np.ascontiguousarray(lr_stack)
    import hashlib
    # hash through the buffer protocol — .tobytes() would copy and this
    # VM's large host copies run at ~120 MB/s (PERF.md, round 4)
    h = hashlib.sha1(memoryview(lr_host).cast("B"))
    h.update(str(lr_host.shape).encode())
    h.update(str(lr_host.dtype).encode())
    key = (h.hexdigest(), int(dim))
    hit = _FEATURE_CACHE.get(key)
    if hit is not None:
        return hit
    from fcsr_tpu.utils import host_cache
    from fcsr_tpu.utils.transfer import device_put_fast
    path = host_cache.cache_path("gatfeat", (lr_host,), (int(dim),))
    disk = host_cache.load(path, ("features",))
    if disk is not None:
        feats = disk[0]
    else:
        lr_np = np.asarray(lr_host, dtype=np.float64)
        n = lr_np.shape[-1]
        a = lr_np + np.eye(n)
        d = a.sum(axis=-1) + 1e-5
        r = d ** -0.5
        a = a * r[..., None, :] * r[..., :, None]
        u, _, _ = np.linalg.svd(a)
        feats = u[..., :, :dim].astype(np.float32)
        host_cache.save(path, features=feats)
    out = device_put_fast(feats)
    if len(_FEATURE_CACHE) >= 8:  # bound device-array residency
        _FEATURE_CACHE.pop(next(iter(_FEATURE_CACHE)))
    _FEATURE_CACHE[key] = out
    return out


def unet_loss(pred, target, a_hist, a_recon_hist,
              intermediate_losses: bool = True):
    """Off-diagonal MSE + intermediate reconstruction MSEs
    (ref: unet-transformer.py:460-475)."""
    loss = offdiag_mse_loss(pred, target)
    if intermediate_losses:
        loss = loss + intermediate_recon_loss(a_hist, a_recon_hist[::-1])
    return loss


def _make_epoch_fn(model: GATGraphUnet, tx, cfg: GATTrainConfig):
    def sample_loss(params, lr_m, hr_m, x_feat, drop_key):
        pred, a_hist, a_recon = model.apply(
            {"params": params}, lr_m, x=x_feat, train=True,
            rngs={"dropout": drop_key})
        return unet_loss(pred, hr_m, a_hist, a_recon,
                         cfg.intermediate_losses)

    @jax.jit
    def epoch_fn(params, opt_state, lr_stack, hr_stack, x_stack, order, key):
        def step(carry, i):
            params, opt_state, key = carry
            key, sub = jax.random.split(key)
            loss, grads = jax.value_and_grad(sample_loss)(
                params, lr_stack[i], hr_stack[i], x_stack[i], sub)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), loss

        (params, opt_state, key), losses = jax.lax.scan(
            step, (params, opt_state, key), order)
        return params, opt_state, key, jnp.mean(losses)

    @jax.jit
    def val_fn(params, lr_stack, hr_stack, x_stack):
        def one(lr_m, hr_m, x_feat):
            pred, a_hist, a_recon = model.apply({"params": params}, lr_m,
                                                x=x_feat, train=False)
            loss = unet_loss(pred, hr_m, a_hist, a_recon,
                             cfg.intermediate_losses)
            n = pred.shape[0]
            off = 1.0 - jnp.eye(n, dtype=pred.dtype)
            mae = jnp.mean(jnp.abs(pred * off - hr_m * off))
            return loss, mae

        losses, maes = jax.vmap(one)(lr_stack, hr_stack, x_stack)
        return jnp.mean(losses), jnp.mean(maes)

    return epoch_fn, val_fn


def train_gat(variables, opt_state, model, tx, cfg: GATTrainConfig,
              lr_train, hr_train, lr_val, hr_val, seed: int = 0,
              verbose: bool = False, logger=None):
    """Full training run with per-epoch validation, plateau LR decay,
    best-state restore, early stop at lr < 1e-5
    (ref: unet-transformer.py:113-197)."""
    from fcsr_tpu.utils.transfer import device_put_fast
    # features from the HOST arrays: handing precompute the device copy
    # would pull the whole stack straight back over the tunnel to hash it
    lr_train_np = np.asarray(lr_train, dtype=np.float32)
    lr_val_np = np.asarray(lr_val, dtype=np.float32)
    lr_train = device_put_fast(lr_train_np)
    hr_train = device_put_fast(np.asarray(hr_train, dtype=np.float32))
    lr_val = device_put_fast(lr_val_np)
    hr_val = device_put_fast(np.asarray(hr_val, dtype=np.float32))
    x_train = precompute_gat_features(lr_train_np, dim=cfg.dim)
    x_val = precompute_gat_features(lr_val_np, dim=cfg.dim)

    params = variables["params"]
    epoch_fn, val_fn = _make_epoch_fn(model, tx, cfg)
    scheduler = PlateauScheduler(cfg.lr, patience=cfg.patience,
                                 factor=cfg.plateau_factor,
                                 threshold=cfg.plateau_threshold)
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    n = lr_train.shape[0]

    cur_lr = cfg.lr
    train_hist, val_hist, lr_hist = [], [], []
    best_val = float("inf")
    best_params = None

    for epoch in range(cfg.epochs):
        order = jnp.asarray(rng.permutation(n).astype(np.int32))
        params, opt_state, key, tr_loss = epoch_fn(
            params, opt_state, lr_train, hr_train, x_train, order, key)
        train_hist.append(float(tr_loss))

        v_loss, v_mae = val_fn(params, lr_val, hr_val, x_val)
        v_loss = float(v_loss)
        val_hist.append(v_loss)
        new_lr = scheduler.step(v_loss)
        if new_lr != cur_lr:
            cur_lr = new_lr
            # lr lives in opt_state (inject_hyperparams): no re-jit.
            # Functional rebuild — optax's hyperparams dict is an
            # implementation detail we must not mutate in place.
            opt_state = opt_state._replace(hyperparams={
                **opt_state.hyperparams,
                "learning_rate": jnp.asarray(cur_lr, jnp.float32)})
        lr_hist.append(cur_lr)

        if v_loss < best_val:  # reference bug (>) fixed here
            best_val = v_loss
            best_params = jax.tree_util.tree_map(np.asarray, params)
        if logger is not None:
            logger.log("epoch", model="gat", epoch=epoch + 1,
                       train_loss=train_hist[-1], val_loss=v_loss,
                       val_mae=float(v_mae), lr=cur_lr)
        if verbose:
            print(f"epoch {epoch + 1}: train {train_hist[-1]:.6f} "
                  f"val {v_loss:.6f} val_mae {float(v_mae):.6f} "
                  f"lr {cur_lr:.2e}")
        if cur_lr < 1e-5:
            break

    if best_params is not None:
        params = jax.tree_util.tree_map(jnp.asarray, best_params)
    return ({"params": params}, opt_state,
            {"train": train_hist, "val": val_hist, "lr": lr_hist})


def adamw_flat_update(g, p, m, v, t, lr, b1=0.9, b2=0.999, eps=1e-8,
                      wd=0.01):
    """optax.adamw update on a flat parameter vector (decoupled weight
    decay folded into the step, matching optax's formula)."""
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * (g * g)
    mhat = m / (1 - b1 ** t)
    vhat = v / (1 - b2 ** t)
    step = lr * (mhat / (jnp.sqrt(vhat) + eps) + wd * p)
    return step, m, v



@functools.lru_cache(maxsize=4)
def _a0_normalize_jit(n_nodes: int):
    from fcsr_tpu.core.normalize import symmetric_normalize
    return jax.jit(lambda a: symmetric_normalize(
        a + jnp.eye(n_nodes, dtype=a.dtype)))


@functools.lru_cache(maxsize=8)
def _gat_fold_programs(cfg: GATTrainConfig, interp: bool):
    """Program bodies for the fold-parallel trainer (epoch, val, chunk)
    plus their jitted forms, built ONCE per (config, backend) and
    cached. Rebuilding these closures inside every trainer call created
    a fresh jax.jit object per run, so EVERY run re-traced and
    re-lowered the whole 25-epoch chunk program on the tunnelled
    frontend even though the compiled executable was cached — the
    module-level cache is the GSR fast_loop playbook
    (fast_loop._build_raw_programs). Dataset arrays are explicit
    arguments (``data = (lr_d, hr_d, x_d, a0_d)``) instead of closure
    constants so one cached program serves any same-shape staging."""
    from jax.flatten_util import ravel_pytree

    from fcsr_tpu.utils.transfer import init_on_host

    model = cfg.model()

    def _template():
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        return model.init({"params": k1, "dropout": k2},
                          jnp.eye(cfg.n_nodes, dtype=jnp.float32) * 0.5)

    template = init_on_host(_template)
    _, unravel = ravel_pytree(template["params"])

    if cfg.fused_step:
        # whole step (fwd + bwd + masked AdamW) as ONE Mosaic kernel;
        # state stays flat between epochs (same best-state/val layout),
        # converted to kernel leaves once per epoch launch
        from fcsr_tpu.models.fused_gat import (ADAM_B1, ADAM_B2,
                                               gat_leaves_from_tree,
                                               gat_train_step_fused,
                                               gat_tree_from_leaves)
        kwf = dict(dim=cfg.dim, ks=cfg.ks, n_nodes=cfg.n_nodes,
                   m_nodes=cfg.m_nodes, heads=cfg.heads,
                   intermediate_losses=cfg.intermediate_losses,
                   drop_p=cfg.drop_p, wd=cfg.weight_decay,
                   batched_chain=cfg.fused_batched_chain)

        def leaves_of(flat):
            return gat_leaves_from_tree(unravel(flat), cfg.dim, cfg.ks,
                                        cfg.heads)

        def flat_of(lv):
            return ravel_pytree(
                gat_tree_from_leaves(lv, cfg.dim, cfg.ks, cfg.heads))[0]

        def epoch_all(state_f, lr_f, active_f, order_f, valid_f, keys_f,
                      data):
            _, hr_d, x_d, a0_d = data

            def fold_epoch(state, lr_s, active, order, valid, key):
                p, m, v, t = state
                p_l, m_l, v_l = leaves_of(p), leaves_of(m), leaves_of(v)

                def step(carry, batch):
                    p_l, m_l, v_l, t, key = carry
                    i, ok = batch
                    ok = ok * active
                    key, sub = jax.random.split(key)
                    seeds = jax.lax.bitcast_convert_type(
                        sub, jnp.int32).reshape(1, 2)
                    t_new = t + ok
                    te = jnp.maximum(t_new, 1.0)
                    # bias corrections use the kernel's OWN betas (one
                    # source of truth — fused_gat.ADAM_B1/B2), so they
                    # can never desynchronize from the in-kernel moments
                    scal = jnp.stack(
                        [ok, lr_s, 1.0 - ADAM_B1 ** te,
                         1.0 - ADAM_B2 ** te]).reshape(1, 4)
                    loss, p_l, m_l, v_l = gat_train_step_fused(
                        p_l, m_l, v_l, a0_d[i], x_d[i], hr_d[i], scal,
                        seeds, interpret=interp, **kwf)
                    return (p_l, m_l, v_l, t_new, key), loss * ok

                (p_l, m_l, v_l, t, _), losses = jax.lax.scan(
                    step, (p_l, m_l, v_l, t, key), (order, valid),
                    unroll=max(1, cfg.scan_unroll))
                denom = jnp.maximum((valid * active).sum(), 1.0)
                return ((flat_of(p_l), flat_of(m_l), flat_of(v_l), t),
                        jnp.sum(losses) / denom)

            return jax.vmap(fold_epoch)(state_f, lr_f, active_f,
                                        order_f, valid_f, keys_f)
    else:
        def sample_loss(flat_params, lr_m, hr_m, x_feat, drop_key):
            pred, a_hist, a_recon = model.apply(
                {"params": unravel(flat_params)}, lr_m, x=x_feat,
                train=True, rngs={"dropout": drop_key})
            return unet_loss(pred, hr_m, a_hist, a_recon,
                             cfg.intermediate_losses)

        grad_fn = jax.value_and_grad(sample_loss)

        def epoch_all(state_f, lr_f, active_f, order_f, valid_f, keys_f,
                      data):
            """One epoch over every fold: scan of masked flat-AdamW
            steps, vmapped over the fold axis."""
            lr_d, hr_d, x_d, _ = data

            def fold_epoch(state, lr_s, active, order, valid, key):
                def step(carry, batch):
                    p, m, v, t, key = carry
                    i, ok = batch
                    ok = ok * active
                    key, sub = jax.random.split(key)
                    loss, g = grad_fn(p, lr_d[i], hr_d[i], x_d[i], sub)
                    t_new = t + ok
                    stp, m_new, v_new = adamw_flat_update(
                        g, p, m, v, jnp.maximum(t_new, 1.0), lr_s,
                        wd=cfg.weight_decay)
                    p = p - ok * stp
                    m = jnp.where(ok > 0, m_new, m)
                    v = jnp.where(ok > 0, v_new, v)
                    return (p, m, v, t_new, key), loss * ok
                # unroll: fewer scan-loop iterations per epoch (exact
                # math; same lever as the GSR fast trainer)
                (p, m, v, t, _), losses = jax.lax.scan(
                    step, (*state, key), (order, valid),
                    unroll=max(1, cfg.scan_unroll))
                denom = jnp.maximum((valid * active).sum(), 1.0)
                return (p, m, v, t), jnp.sum(losses) / denom

            return jax.vmap(fold_epoch)(state_f, lr_f, active_f,
                                        order_f, valid_f, keys_f)

    def val_all(flat_f, va_idx, va_valid, data):
        lr_d, hr_d, x_d, a0_d = data
        if cfg.fused_step and cfg.fused_val:
            # one Mosaic kernel per val subject (loss + off-diag MAE):
            # the unfused per-subject flax forward is the dominant
            # per-epoch cost once training steps are fused
            # (tools/experiments/gat_trainer_breakdown.py)
            from fcsr_tpu.models.fused_gat import gat_val_fused
            kwv = dict(dim=cfg.dim, ks=cfg.ks, n_nodes=cfg.n_nodes,
                       m_nodes=cfg.m_nodes, heads=cfg.heads,
                       intermediate_losses=cfg.intermediate_losses,
                       interpret=interp,
                       batched_chain=cfg.fused_batched_chain)

            def fold_val(flat_params, idx, valid):
                p_l = leaves_of(flat_params)

                def one(i):
                    return gat_val_fused(p_l, a0_d[i], x_d[i], hr_d[i],
                                         **kwv)
                losses, maes = jax.vmap(one)(idx)
                denom = jnp.maximum(valid.sum(), 1.0)
                return (jnp.sum(losses * valid) / denom,
                        jnp.sum(maes * valid) / denom)

            return jax.vmap(fold_val)(flat_f, va_idx, va_valid)

        def fold_val(flat_params, idx, valid):
            def one(i):
                pred, a_hist, a_recon = model.apply(
                    {"params": unravel(flat_params)}, lr_d[i], x=x_d[i],
                    train=False)
                loss = unet_loss(pred, hr_d[i], a_hist, a_recon,
                                 cfg.intermediate_losses)
                n = pred.shape[0]
                off = 1.0 - jnp.eye(n, dtype=pred.dtype)
                mae = jnp.mean(jnp.abs(pred * off - hr_d[i] * off))
                return loss, mae
            losses, maes = jax.vmap(one)(idx)
            denom = jnp.maximum(valid.sum(), 1.0)
            return (jnp.sum(losses * valid) / denom,
                    jnp.sum(maes * valid) / denom)

        return jax.vmap(fold_val)(flat_f, va_idx, va_valid)

    thr = cfg.plateau_threshold
    patience = cfg.patience
    factor = cfg.plateau_factor

    def run_chunk(carry, orders_c, valids_c, va_idx, va_valid, data):
        """``orders_c``/``valids_c``: (chunk, F, L). Carries the FULL
        control state: (train state, PRNG keys, lr, active, scheduler
        best, scheduler bad-count, best val, best params)."""
        def one_epoch(carry, xs):
            state, keys, lr, active, sbest, nbad, bval, bflat = carry
            order, valid = xs
            subs = jax.vmap(jax.random.split)(keys)
            keys2, ekeys = subs[:, 0], subs[:, 1]
            state2, tr_loss = epoch_all(state, lr, active, order, valid,
                                        ekeys, data)
            vloss, _ = val_all(state2[0], va_idx, va_valid, data)
            act = active > 0
            # torch ReduceLROnPlateau(mode='min', rel threshold) — the
            # exact PlateauScheduler.step logic as vectorized lax ops
            is_better = vloss < sbest * (1.0 - thr)
            sbest2 = jnp.where(is_better, vloss, sbest)
            nbad2 = jnp.where(is_better, 0, nbad + 1)
            decay = nbad2 > patience
            lr2 = jnp.where(decay, lr * factor, lr)
            nbad2 = jnp.where(decay, 0, nbad2)
            sbest2 = jnp.where(act, sbest2, sbest)
            nbad2 = jnp.where(act, nbad2, nbad)
            lr2 = jnp.where(act, lr2, lr)
            improved = act & (vloss < bval)   # ref bug (>) fixed: BEST
            bval2 = jnp.where(improved, vloss, bval)
            bflat2 = jnp.where(improved[:, None], state2[0], bflat)
            active2 = jnp.where(act & (lr2 < 1e-5), 0.0, active)
            # ``active`` at epoch START: exactly the epochs the host
            # loop would have recorded for this fold
            hist = (tr_loss, vloss, lr2, active)
            return (state2, keys2, lr2, active2, sbest2, nbad2, bval2,
                    bflat2), hist

        carry, hists = jax.lax.scan(one_epoch, carry,
                                    (orders_c, valids_c))
        return carry, hists

    return SimpleNamespace(
        model=model, unravel=unravel, epoch_all=epoch_all,
        val_all=val_all, run_chunk=run_chunk,
        chunk_jit=jax.jit(run_chunk),
        epoch_jit=jax.jit(epoch_all), val_jit=jax.jit(val_all))


_SHARDED_CHUNK_PROGRAMS: dict = {}


def _sharded_chunk_program(progs, mesh):
    """The fold-sharded jit of ``progs.run_chunk``, cached per
    (programs, mesh) — progs instances are themselves cached, so repeat
    multichip trainer calls share ONE traced + lowered executable."""
    # SimpleNamespace is unhashable; key by id and pin progs in the
    # value so the id cannot be recycled while the entry lives
    key = (id(progs), mesh)
    hit = _SHARDED_CHUNK_PROGRAMS.get(key)
    if hit is not None:
        return hit[0]
    from jax.sharding import NamedSharding, PartitionSpec as P
    fold = NamedSharding(mesh, P("batch"))
    efold = NamedSharding(mesh, P(None, "batch"))
    rep = NamedSharding(mesh, P())
    carry_sh = ((fold, fold, fold, fold), fold, fold, fold, fold,
                fold, fold, fold)
    fn = jax.jit(
        progs.run_chunk,
        in_shardings=(carry_sh, efold, efold, fold, fold,
                      (rep, rep, rep, rep)),
        out_shardings=(carry_sh, (efold, efold, efold, efold)))
    if len(_SHARDED_CHUNK_PROGRAMS) >= 8:
        _SHARDED_CHUNK_PROGRAMS.pop(next(iter(_SHARDED_CHUNK_PROGRAMS)))
    _SHARDED_CHUNK_PROGRAMS[key] = (fn, progs)
    return fn


def train_gat_folds_parallel(cfg: GATTrainConfig, lr_all, hr_all, folds,
                             seed: int = 42, verbose: bool = False,
                             host_control: bool = False,
                             control_chunk_epochs: int = 25,
                             mesh=None):
    """All CV folds trained as ONE vmapped program (the fast_loop playbook
    applied to the GAT family): flat-vector AdamW, per-fold traced lr for
    the plateau schedule (no re-jit on decay), masked no-op steps padding
    ragged fold sizes, per-fold early-stop masks. The control loop
    (scheduler, best-state snapshot, early stop) matches the single-fold
    ``train_gat`` semantics with per-fold seeds ``seed + j`` (exactly what
    ``run_gat_cv`` passes). Dropout streams differ from ``train_gat``
    (per-fold keys come from one ``split(PRNGKey(seed))`` and are consumed
    on masked padding steps), so with ``drop_p > 0`` the trajectories are
    stochastically equivalent rather than bitwise identical; with
    ``drop_p = 0`` they match exactly (tested).

    **Control runs ON DEVICE by default**: the plateau scheduler, the
    best-params snapshot, and the early-stop masks are all lax.scan carry
    inside a chunked compiled program (ref semantics:
    utils/training.py:114-145 / unet-transformer.py:149-195). Per-epoch
    shuffle plans are pregenerated on the host with the SAME RNG sequence
    the host-control loop draws, so the two paths are trajectory-identical
    at drop_p=0 (tested); the run makes ONE scalar pull per
    ``control_chunk_epochs`` epochs (early-exit check) plus one bulk pull
    at the end, instead of 100 epochs x (scalar + params) round trips —
    the host-control loop's wall clock doubled under a slow tunnel.
    ``host_control=True`` keeps the legacy per-epoch host loop.

    ``mesh`` (optional 1-D ``('batch',)`` jax.sharding.Mesh) shards the
    FOLD axis over the devices with the dataset replicated — the same
    zero-collective layout as GSRFoldRunner (fold count padded to a mesh
    multiple with fully-masked no-op folds). On-device control only.

    Returns (model, best_variables_per_fold, histories list).
    """
    from jax.flatten_util import ravel_pytree

    from fcsr_tpu.utils.transfer import device_put_fast

    if mesh is not None and host_control:
        raise ValueError("mesh= requires on-device control "
                         "(host_control=False)")

    interp = jax.default_backend() != "tpu"
    # epochs doesn't shape the programs (the chunk scan length comes from
    # the orders operand) — normalize it out of the cache key
    from dataclasses import replace as _dc_replace
    progs = _gat_fold_programs(_dc_replace(cfg, epochs=0), interp)
    model, unravel = progs.model, progs.unravel
    lr_np = np.asarray(lr_all, dtype=np.float32)
    hr_np = np.asarray(hr_all, dtype=np.float32)
    if mesh is None:
        _put_rep = device_put_fast
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P
        _rep_sh = NamedSharding(mesh, P())
        _fold_sh = NamedSharding(mesh, P("batch"))

        def _put_rep(a):
            return jax.device_put(jnp.asarray(a), _rep_sh)
    # the LR/HR stacks are shared with the prediction/eval passes
    # (pipelines) — one staging per dataset, not one per call
    if mesh is None:
        from fcsr_tpu.utils.transfer import stage_cached
        lr_d = stage_lr_cached(lr_np)
        hr_d = stage_cached(hr_np)
    else:
        lr_d = _put_rep(lr_np)
        hr_d = _put_rep(hr_np)
    x_d = _put_rep(np.asarray(
        precompute_gat_features(lr_np, dim=cfg.dim))) if mesh is not None \
        else precompute_gat_features(lr_np, dim=cfg.dim)

    n_real_folds = len(folds)
    n_pad_folds = 0
    if mesh is not None:
        n_pad_folds = (-len(folds)) % mesh.devices.size
        folds = list(folds) + [(np.zeros(1, np.int32),
                                np.zeros(1, np.int32))] * n_pad_folds
    n_folds = len(folds)

    def _put_folded(a):
        a = jnp.asarray(a)
        return a if mesh is None else jax.device_put(a, _fold_sh)

    from fcsr_tpu.utils.transfer import init_on_host

    def _init_fold(j):
        k_init, k_drop = jax.random.split(jax.random.PRNGKey(seed + j))
        variables = model.init({"params": k_init, "dropout": k_drop},
                               jnp.eye(cfg.n_nodes, dtype=jnp.float32) * 0.5)
        return ravel_pytree(variables["params"])

    # seeded inits are deterministic — memoize the stacked flat init per
    # (model config, seed, fold count) so repeat runs (bench passes,
    # sweeps) skip the eager host inits entirely. Eager is deliberate
    # here (the init traces an SVD, a known jit compile tarpit —
    # ROUND_NOTES landmine 3), which is exactly why it is worth caching.
    init_key = (repr(_dc_replace(cfg, epochs=0)), seed, n_folds)
    flats_np = _INIT_FLAT_CACHE.get(init_key)
    if flats_np is None:
        # disk layer under the in-process memo: seeded inits are pure
        # functions of (cfg, seed, fold count), and a FRESH process
        # (the one-shot CV run, first_run_s) otherwise pays the eager
        # host init stack again
        from fcsr_tpu.utils import host_cache
        dpath = host_cache.cache_path("gat_init", (), extra=init_key)
        hit = host_cache.load(dpath, ("flats",))
        if hit is not None:
            flats_np = hit[0]
    if flats_np is None:
        flats = []
        for j in range(n_folds):
            # init on the host CPU backend: eager init through the TPU
            # tunnel costs ~4-6 s PER FOLD in per-op round trips
            flat, _ = init_on_host(lambda j=j: _init_fold(j))
            flats.append(np.asarray(flat))
        flats_np = np.stack(flats)
        host_cache.save(dpath, flats=flats_np)
    if len(_INIT_FLAT_CACHE) >= 4:
        _INIT_FLAT_CACHE.pop(next(iter(_INIT_FLAT_CACHE)))
    _INIT_FLAT_CACHE[init_key] = flats_np
    flat_f = _put_folded(jnp.asarray(flats_np))

    tr_sets = [np.asarray(tr, dtype=np.int32) for tr, _ in folds]
    va_sets = [np.asarray(va, dtype=np.int32) for _, va in folds]
    if n_pad_folds:  # masked no-op folds: every train/val slot invalid
        for j in range(n_real_folds, n_folds):
            tr_sets[j] = np.zeros(0, np.int32)
            va_sets[j] = np.zeros(0, np.int32)
    tr_len = max(max(len(s) for s in tr_sets), 1)
    va_idx = np.zeros((n_folds, max(max(len(s) for s in va_sets), 1)),
                      np.int32)
    va_valid = np.zeros_like(va_idx, dtype=np.float32)
    for j, s in enumerate(va_sets):
        va_idx[j, :len(s)] = s
        va_valid[j, :len(s)] = 1.0
    va_idx = _put_folded(va_idx)
    va_valid = _put_folded(va_valid)

    # staged dataset handed to the CACHED programs as explicit args
    if cfg.fused_step:
        a0_d = _a0_normalize_jit(cfg.n_nodes)(lr_d)
    else:
        a0_d = lr_d  # placeholder leaf (unused by the unfused programs)
    data = (lr_d, hr_d, x_d, a0_d)

    z = jnp.zeros_like(flat_f)
    state = (flat_f, z, z,
             _put_folded(jnp.zeros((n_folds,), jnp.float32)))
    rngs = [np.random.default_rng(seed + j) for j in range(n_folds)]
    keys = jax.random.split(jax.random.PRNGKey(seed), n_folds)

    def draw_epoch_plan():
        """One epoch's per-fold shuffled (padded) index plan — drawn from
        the SAME per-fold host RNG sequence as the legacy host-control
        loop, so both control paths consume identical permutations."""
        order = np.zeros((n_folds, tr_len), np.int32)
        valid = np.zeros((n_folds, tr_len), np.float32)
        for j, s in enumerate(tr_sets):
            if len(s):
                perm = s[rngs[j].permutation(len(s))]
                order[j, :len(s)] = perm
                valid[j, :len(s)] = 1.0
        return order, valid

    if host_control:
        epoch_jit = progs.epoch_jit
        val_jit = progs.val_jit
        schedulers = [PlateauScheduler(cfg.lr, patience=cfg.patience,
                                       factor=cfg.plateau_factor,
                                       threshold=cfg.plateau_threshold)
                      for _ in range(n_folds)]
        cur_lr = np.full(n_folds, cfg.lr, dtype=np.float32)
        # padding folds (mesh) are masked no-ops: start them inactive so
        # the all-stopped early exit tracks only real folds
        active = np.zeros(n_folds, dtype=np.float32)
        active[:n_real_folds] = 1.0
        best_val = np.full(n_folds, np.inf)
        best_flat = [None] * n_folds
        hists = [{"train": [], "val": [], "lr": []}
                 for _ in range(n_folds)]

        for epoch in range(cfg.epochs):
            order, valid = draw_epoch_plan()
            subs = jax.vmap(jax.random.split)(keys)
            keys, epoch_keys = subs[:, 0], subs[:, 1]
            state, tr_loss_f = epoch_jit(state, jnp.asarray(cur_lr),
                                         jnp.asarray(active),
                                         jnp.asarray(order),
                                         jnp.asarray(valid), epoch_keys,
                                         data)
            v_loss_f, v_mae_f = val_jit(state[0], va_idx, va_valid, data)
            # ONE scalar pull per epoch; the ~1 MB params pull happens
            # only on epochs where some fold actually improved (the loop
            # is tunnel-round-trip sensitive: 100 epochs of host control)
            packed = np.asarray(jnp.concatenate([tr_loss_f, v_loss_f]))
            tr_loss_f = packed[:n_folds]
            v_loss_f = packed[n_folds:]
            improved = [bool(active[j]) and v_loss_f[j] < best_val[j]
                        for j in range(n_folds)]
            flat_now = np.asarray(state[0]) if any(improved) else None

            for j in range(n_folds):
                if not active[j]:
                    continue
                hists[j]["train"].append(float(tr_loss_f[j]))
                hists[j]["val"].append(float(v_loss_f[j]))
                new_lr = schedulers[j].step(float(v_loss_f[j]))
                cur_lr[j] = new_lr
                hists[j]["lr"].append(float(new_lr))
                if improved[j]:  # reference bug (>) fixed: keep the BEST
                    best_val[j] = v_loss_f[j]
                    best_flat[j] = flat_now[j].copy()
                if new_lr < 1e-5:
                    active[j] = 0.0
            if verbose:
                print(f"epoch {epoch + 1}: val {v_loss_f.round(6)} "
                      f"lr {cur_lr}")
            if not active.any():
                break

        best_variables = []
        for j in range(n_folds):
            flat = best_flat[j] if best_flat[j] is not None \
                else np.asarray(state[0][j])
            best_variables.append({"params": unravel(jnp.asarray(flat))})
        return model, best_variables, hists

    # ---- on-device control (default) ----------------------------------
    if mesh is None:
        # AOT executable disk cache: a fresh process skips the ~14 s
        # client lower+compile of the chunk program (the server-side
        # per-process load is paid either way — PERF.md, measured with
        # tools/experiments/gat_aot_probe.py). Unsharded path only;
        # falls back to the plain jit on any failure or when disabled
        # (FCSR_AOT_CACHE=0 / non-TPU backend).
        from fcsr_tpu.utils.aot_cache import wrap as _aot_wrap
        chunk_fn = _aot_wrap(
            f"gat_chunk|{_dc_replace(cfg, epochs=0)!r}|interp={interp}",
            progs.chunk_jit)
        _put_epochs = jnp.asarray
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P
        efold = NamedSharding(mesh, P(None, "batch"))
        # cached per (programs, mesh): a fresh jax.jit here would
        # re-trace + re-lower the whole chunk program on EVERY trainer
        # call — the exact fixed overhead the unsharded path's
        # chunk_jit cache removes (PERF.md trainer composition)
        chunk_fn = _sharded_chunk_program(progs, mesh)

        def _put_epochs(a):
            return jax.device_put(jnp.asarray(a), efold)

    # padding folds start INACTIVE: they are fully masked no-ops, and
    # starting them active would keep the all-stopped early exit below
    # waiting ~2*(patience+1) epochs for their dummy schedulers to decay
    active0 = np.zeros(n_folds, np.float32)
    active0[:n_real_folds] = 1.0
    carry = (state, _put_folded(keys),
             _put_folded(jnp.full((n_folds,), cfg.lr, jnp.float32)),
             _put_folded(jnp.asarray(active0)),
             _put_folded(jnp.full((n_folds,), jnp.inf, jnp.float32)),
             _put_folded(jnp.zeros((n_folds,), jnp.int32)),
             _put_folded(jnp.full((n_folds,), jnp.inf, jnp.float32)),
             flat_f)
    hist_parts = []
    done = 0
    while done < cfg.epochs:
        chunk = min(control_chunk_epochs, cfg.epochs - done)
        oc = np.zeros((chunk, n_folds, tr_len), np.int32)
        vc = np.zeros((chunk, n_folds, tr_len), np.float32)
        for e in range(chunk):
            oc[e], vc[e] = draw_epoch_plan()
        carry, hists_c = chunk_fn(carry, _put_epochs(oc), _put_epochs(vc),
                                  va_idx, va_valid, data)
        hist_parts.append(hists_c)
        done += chunk
        # ONE scalar pull per chunk: early-exit when every fold stopped
        still_active = float(jnp.max(carry[3]))
        if verbose:
            print(f"epochs {done}: active={still_active > 0}")
        if still_active == 0.0:
            break

    # one bulk pull at the end: histories + best state
    tr_h, v_h, lr_h, act_h = (np.concatenate(
        [np.asarray(h[i]) for h in hist_parts], axis=0) for i in range(4))
    _, _, _, _, _, _, bval_d, bflat_d = carry
    bval_np = np.asarray(bval_d)
    bflat_np = np.asarray(bflat_d)
    final_np = np.asarray(carry[0][0])

    hists = []
    for j in range(n_real_folds):
        mask = act_h[:, j] > 0
        hists.append({"train": [float(x) for x in tr_h[mask, j]],
                      "val": [float(x) for x in v_h[mask, j]],
                      "lr": [float(x) for x in lr_h[mask, j]]})
    best_variables = []
    for j in range(n_real_folds):
        # NaN-robust fallback mirroring the host loop: a fold that never
        # improved (bval still inf) returns its FINAL params
        flat = bflat_np[j] if np.isfinite(bval_np[j]) else final_np[j]
        best_variables.append({"params": unravel(jnp.asarray(flat))})
    return model, best_variables, hists


# Prediction programs are cached per MODEL (flax modules hash by config,
# so equal-config models — e.g. one per bench pass — share ONE jitted
# program instead of paying a fresh trace + lower per call; measured
# 6.9 s val-predict + 9 s test-predict per steady family-bench pass
# before caching, tools/experiments — see PERF.md).
_PREDICT_PROGRAMS: dict = {}


def _predict_program(model: GATGraphUnet):
    prog = _PREDICT_PROGRAMS.get(model)
    if prog is None:
        @jax.jit
        def prog(variables, lr_b, x_b):
            def one(lr_m, x_feat):
                pred, _, _ = model.apply(variables, lr_m, x=x_feat,
                                         train=False)
                return pred
            return jax.vmap(one)(lr_b, x_b)
        _PREDICT_PROGRAMS[model] = prog
    return prog


_FOLD_PREDICT_PROGRAMS: dict = {}


def predict_gat_folds(model: GATGraphUnet, best_vars, lr_d, x_d, va_idx):
    """All folds' validation predictions in ONE jitted program (vmapped
    over per-fold params AND val subjects; ragged fold sizes padded) —
    per-fold predict calls would each pay their own dispatch and feature
    staging. Returns (folds, va_len, m, m) predictions."""
    from jax.flatten_util import ravel_pytree
    flats = []
    unravel = None
    for v in best_vars:
        flat, unravel = ravel_pytree(v)
        flats.append(flat)
    flat_f = jnp.stack(flats)
    # unravel is structurally determined by (model, flat width): reusing
    # the cached program's captured unravel for later equal-key calls is
    # exact, not approximate
    key = (model, int(flat_f.shape[-1]))
    prog = _FOLD_PREDICT_PROGRAMS.get(key)
    if prog is None:
        @jax.jit
        def prog(flat_f, idx_f, lr_d, x_d):
            def fold(flat, idx):
                params = unravel(flat)

                def one(i):
                    pred, _, _ = model.apply(params, lr_d[i], x=x_d[i],
                                             train=False)
                    return pred

                return jax.vmap(one)(idx)

            return jax.vmap(fold)(flat_f, idx_f)
        _FOLD_PREDICT_PROGRAMS[key] = prog
    return prog(flat_f, jnp.asarray(va_idx), lr_d, x_d)


_FOLD_MAE_PROGRAMS: dict = {}


def predict_gat_folds_mae(model: GATGraphUnet, best_vars, lr_d, x_d,
                          va_idx, hr_d, va_len):
    """Every fold's validation off-diagonal MAE as ONE jitted dispatch
    returning (F,) scalars — nothing larger crosses the link (the
    predictions stay on device; use ``predict_gat_folds`` when the
    dense stacks are actually needed, e.g. for the NetworkX metric
    suite). Ragged fold sizes are padded in ``va_idx``; ``va_len``
    gives each fold's true size and the padded rows are masked out of
    the mean."""
    from jax.flatten_util import ravel_pytree
    flats = []
    unravel = None
    for v in best_vars:
        flat, unravel = ravel_pytree(v)
        flats.append(flat)
    flat_f = jnp.stack(flats)
    key = (model, int(flat_f.shape[-1]))
    prog = _FOLD_MAE_PROGRAMS.get(key)
    if prog is None:
        @jax.jit
        def prog(flat_f, idx_f, len_f, lr_d, x_d, hr_d):
            def fold(flat, idx, m):
                params = unravel(flat)

                def one(i):
                    pred, _, _ = model.apply(params, lr_d[i], x=x_d[i],
                                             train=False)
                    gt = hr_d[i]
                    n = gt.shape[-1]
                    off = 1.0 - jnp.eye(n, dtype=pred.dtype)
                    return (jnp.abs(pred - gt) * off).sum() / (n * (n - 1))

                per = jax.vmap(one)(idx)          # (va_len,) per-subject
                valid = jnp.arange(idx.shape[0]) < m
                return jnp.where(valid, per, 0.0).sum() / m

            return jax.vmap(fold)(flat_f, idx_f, len_f)
        _FOLD_MAE_PROGRAMS[key] = prog
    return prog(flat_f, jnp.asarray(va_idx),
                jnp.asarray(va_len, jnp.float32), lr_d, x_d, hr_d)


def predict_gat(variables, model: GATGraphUnet, cfg: GATTrainConfig,
                lr_stack):
    """Batched inference (ref: unet-transformer.py:433-446)."""
    from fcsr_tpu.utils.transfer import device_put_fast
    lr_np = np.asarray(lr_stack, dtype=np.float32)
    x = precompute_gat_features(lr_np, dim=cfg.dim)
    return _predict_program(model)(variables, device_put_fast(lr_np), x)
