"""Performance GSR trainer: fold-parallel, flat-parameter Adam,
device-resident data.

The parity trainer (gsr_loop) replicates the reference's per-sample
sequential Adam exactly but is op-dispatch-bound on TPU: each step is ~250
small ops over (<=268)-sized tensors. Three exact-math restructurings fix
that without touching per-fold training dynamics:

  * **Fold parallelism** — k-fold CV trains k independent models (one per
    fold, fresh init: clean-CV semantics). All folds execute as ONE
    vmapped program: same op count, k x the work per op, so fixed per-op
    overhead is amortized k-fold. Shorter folds pad their per-epoch sample
    sequence with masked no-op steps, preserving each fold's exact update
    sequence.
  * **Flat Adam** — parameters/grads are raveled into a single vector so
    the Adam update is one fused elementwise chain instead of ~4 ops per
    parameter leaf (the optimizer trajectory is identical).
  * **On-device fold gathering** — the dataset ships to HBM once (flat-
    staged, see utils/transfer.py); per-fold sample selection is an integer
    gather inside the compiled program, so no fold-expanded copies ever
    cross the host<->device link.

Per-fold numerical trajectory matches the parity trainer's
reset-per-fold mode up to float reassociation (verified in tests).
"""

from __future__ import annotations

import hashlib
import os
from functools import lru_cache
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from fcsr_tpu.core.normalize import fill_diagonal, unpad
from fcsr_tpu.train.gsr_loop import GSRTrainConfig, precompute_spectral
from fcsr_tpu.train.losses import gsr_composite_loss
from fcsr_tpu.utils.transfer import device_put_fast, init_on_host

__all__ = ["stage_dataset", "train_gsr_folds_parallel",
           "evaluate_gsr_folds", "adam_flat_update", "GSRFoldRunner"]


def adam_flat_update(g, m, v, t, lr, b1=0.9, b2=0.999, eps=1e-8):
    """torch.optim.Adam update on a flat parameter vector."""
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * (g * g)
    mhat = m / (1 - b1 ** t)
    vhat = v / (1 - b2 ** t)
    step = lr * mhat / (jnp.sqrt(vhat) + eps)
    return step, m, v


@lru_cache(maxsize=32)
def _build_raw_programs(cfg: GSRTrainConfig, epochs: int = None):
    """Unjitted train / eval program bodies, cached per (config,
    epoch-chunk). Both take the WHOLE dataset plus per-fold index plans and
    gather on device. ``epochs`` overrides cfg.epochs (used for checkpoint
    chunks)."""
    n_epochs = cfg.epochs if epochs is None else epochs
    if cfg.padding and (cfg.fused_step or cfg.fused_tail or cfg.fused_adam):
        # the fused kernels compute the loss at hr_dim without the
        # unfused branch's unpad() crop — supporting padding there means
        # new kernel variants, not a silent wrong loss
        raise ValueError(
            "padding != 0 is not supported by the fused kernel paths "
            "(fused_step/fused_tail/fused_adam); use the unfused "
            "trainer (all fused flags False) for padded configs")
    model = cfg.model()

    def _template():
        dummy = jnp.eye(cfg.lr_dim, dtype=jnp.float32)
        # dummy u_lr keeps the (expensive-to-compile) in-forward eigh out
        # of the init trace — parameter creation is identical either way
        return model.init(jax.random.PRNGKey(0), dummy, u_lr=dummy)

    # host-CPU init: eager init over the TPU tunnel is seconds of
    # per-op round trips (tools/experiments/gat_fixed_cost.py)
    template = init_on_host(_template)
    _, unravel = ravel_pytree(template)

    if cfg.fused_step:
        from fcsr_tpu.models.fused_step import gsr_step_loss_fused

        def loss_fn(flat_params, a_norm_m, hr_m, u_lr, u_hr):
            del a_norm_m  # the U-Net never consumes it (ref models/ops.py:50-61)
            params = unravel(flat_params)
            p = params["params"]
            return gsr_step_loss_fused(
                p["net"], p["layer"]["weights"], p["gc1"]["weight"],
                p["gc2"]["weight"], u_lr, u_hr, hr_m, cfg.ks, cfg.lr_dim,
                cfg.hr_dim, cfg.lmbda,
                interpret=jax.default_backend() != "tpu")
    elif cfg.fused_tail:
        from fcsr_tpu.models.fused_tail import tail_loss_fused
        from fcsr_tpu.models.gsr import GraphUnet
        from fcsr_tpu.train.losses import l1
        unet = GraphUnet(cfg.ks, cfg.lr_dim, cfg.hr_dim, dim=cfg.hr_dim)
        eye = jnp.eye(cfg.lr_dim, dtype=jnp.float32)

        def run_unet(params, a_norm_m):
            interp = jax.default_backend() != "tpu"
            if cfg.fused_unet and cfg.fused_unet_bwd:
                from fcsr_tpu.models.fused_step import unet_fused_fwdbwd
                return unet_fused_fwdbwd(
                    params["params"]["net"], cfg.ks, cfg.lr_dim,
                    cfg.hr_dim, interpret=interp)
            if cfg.fused_unet:
                from fcsr_tpu.models.fused_step import unet_fused_fwdonly
                return unet_fused_fwdonly(
                    params["params"]["net"], cfg.ks, cfg.lr_dim,
                    cfg.hr_dim, interpret=interp)
            return unet.apply({"params": params["params"]["net"]},
                              a_norm_m, eye)

        def loss_fn(flat_params, a_norm_m, hr_m, u_lr, u_hr):
            params = unravel(flat_params)
            net_outs, start_outs = run_unet(params, a_norm_m)
            w = params["params"]["layer"]["weights"]
            w1 = params["params"]["gc1"]["weight"]
            w2 = params["params"]["gc2"]["weight"]
            tail = tail_loss_fused(
                w, w1, w2, net_outs, u_lr, u_hr, hr_m,
                interpret=jax.default_backend() != "tpu")
            loss = cfg.lmbda * l1(net_outs, start_outs) + tail
            # reconstruction error = tail minus the spectral term
            err = tail - jnp.mean(jnp.abs(w - u_hr))
            return loss, err
    else:
        # optional bf16 fast mode: matmul OPERANDS in bfloat16, f32 master
        # params / Adam / accumulations (model matmuls already request
        # preferred_element_type=f32). Non-default; measured delta in
        # PERF.md. Loss terms compare f32-upcast tensors.
        bf16 = cfg.compute_dtype == "bf16"

        def _cast(x):
            return x.astype(jnp.bfloat16) if bf16 else x

        def loss_fn(flat_params, a_norm_m, hr_m, u_lr, u_hr):
            params = unravel(flat_params)
            if bf16:
                params = jax.tree_util.tree_map(_cast, params)
            pred, net_outs, start_outs, _ = model.apply(
                params, _cast(a_norm_m), u_lr=_cast(u_lr),
                a_norm=_cast(a_norm_m))
            pred = unpad(pred.astype(jnp.float32), cfg.padding)
            w = params["params"]["layer"]["weights"].astype(jnp.float32)
            return gsr_composite_loss(pred, net_outs.astype(jnp.float32),
                                      start_outs.astype(jnp.float32), w,
                                      u_hr, hr_m, cfg.lmbda)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    if cfg.fused_adam:
        # whole training step (fwd + bwd + masked Adam) as ONE kernel:
        # the state stays FLAT between chunks (same runner/checkpoint/
        # eval layout) and is converted to kernel-leaf lists once per
        # chunk launch; Adam is elementwise, so per-leaf in-kernel
        # updates are math-identical to the flat update.
        from fcsr_tpu.models.fused_step import _lin_names, train_step_fused
        names = _lin_names(len(cfg.ks))
        n_mod = len(names)
        b1, b2 = 0.9, 0.999

        def tree_to_leaves(params):
            p = params["params"]
            net = p["net"]
            ws = [net[n]["proj"]["kernel"] for n in names[:-1]]
            w_end = net["end_gcn"]["proj"]["kernel"]
            ws = ws + [w_end[:cfg.hr_dim], w_end[cfg.hr_dim:]]
            bs = [net[n]["proj"]["bias"][None, :] for n in names]
            return ws + bs + [p["layer"]["weights"], p["gc1"]["weight"],
                              p["gc2"]["weight"]]

        def leaves_to_tree(kl):
            ws, bs = kl[:n_mod + 1], kl[n_mod + 1:2 * n_mod + 1]
            wg, w1, w2 = kl[2 * n_mod + 1:]
            net = {}
            for j, n in enumerate(names[:-1]):
                net[n] = {"proj": {"kernel": ws[j], "bias": bs[j][0]}}
            net["end_gcn"] = {"proj": {
                "kernel": jnp.concatenate([ws[n_mod - 1], ws[n_mod]],
                                          axis=0),
                "bias": bs[n_mod - 1][0]}}
            return {"params": {"net": net, "layer": {"weights": wg},
                               "gc1": {"weight": w1},
                               "gc2": {"weight": w2}}}

        def train_all(state_f, a_norm_all, hr_all, u_lr_all, u_hr_all,
                      idxs_f, valid_f):
            interp = jax.default_backend() != "tpu"

            def fold_train(state, idx, valid):
                flat_p, flat_m, flat_v, t0 = state
                p_l = tree_to_leaves(unravel(flat_p))
                m_l = tree_to_leaves(unravel(flat_m))
                v_l = tree_to_leaves(unravel(flat_v))

                def sample_step(carry, batch):
                    p_l, m_l, v_l, t = carry
                    i, ok = batch
                    okf = ok.astype(jnp.float32)
                    t_new = t + okf
                    t_eff = jnp.maximum(t_new, 1.0)
                    scal = jnp.stack(
                        [okf, 1.0 - b1 ** t_eff,
                         1.0 - b2 ** t_eff]).reshape(1, 3)
                    loss, err, p_l, m_l, v_l = train_step_fused(
                        p_l, m_l, v_l, u_lr_all[i], u_hr_all[i],
                        hr_all[i], scal, cfg.ks, cfg.lr_dim, cfg.hr_dim,
                        cfg.lmbda, cfg.lr, interpret=interp)
                    return (p_l, m_l, v_l, t_new), (loss, err)

                def epoch(carry, _):
                    carry, (losses, errs) = jax.lax.scan(
                        sample_step, carry, (idx, valid), unroll=4)
                    denom = jnp.maximum(valid.sum(), 1.0)
                    return carry, (jnp.sum(losses) / denom,
                                   jnp.sum(errs) / denom)

                carry = (p_l, m_l, v_l, t0)
                carry, (loss_hist, err_hist) = jax.lax.scan(
                    epoch, carry, None, length=n_epochs)
                p_l, m_l, v_l, t = carry
                state = (ravel_pytree(leaves_to_tree(p_l))[0],
                         ravel_pytree(leaves_to_tree(m_l))[0],
                         ravel_pytree(leaves_to_tree(v_l))[0], t)
                return state, loss_hist, err_hist

            return jax.vmap(fold_train, in_axes=(0, 0, 0))(
                state_f, idxs_f, valid_f)
    else:
        train_all = None

    def _train_all_default(state_f, a_norm_all, hr_all, u_lr_all,
                           u_hr_all, idxs_f, valid_f):
        def fold_train(state, idx, valid):
            def sample_step(carry, batch):
                p, m, v, t = carry
                i, ok = batch
                (loss, err), g = grad_fn(p, a_norm_all[i], hr_all[i],
                                         u_lr_all[i], u_hr_all[i])
                okf = ok.astype(p.dtype)
                t_new = t + okf
                step, m_new, v_new = adam_flat_update(
                    g, m, v, jnp.maximum(t_new, 1.0), cfg.lr)
                p = p - okf * step
                m = jnp.where(ok > 0, m_new, m)
                v = jnp.where(ok > 0, v_new, v)
                return (p, m, v, t_new), (loss * okf, err * okf)

            def epoch(carry, _):
                carry, (losses, errs) = jax.lax.scan(sample_step, carry,
                                                     (idx, valid),
                                                     unroll=4)
                denom = jnp.maximum(valid.sum(), 1.0)
                return carry, (jnp.sum(losses) / denom,
                               jnp.sum(errs) / denom)

            state, (loss_hist, err_hist) = jax.lax.scan(
                epoch, state, None, length=n_epochs)
            return state, loss_hist, err_hist

        return jax.vmap(fold_train, in_axes=(0, 0, 0))(
            state_f, idxs_f, valid_f)

    if train_all is None:
        train_all = _train_all_default

    def eval_all(flat_params_f, a_norm_all, hr_all, u_lr_all, idxs_f,
                 valid_f):
        def fold_eval(flat_params, idx, valid):
            params = unravel(flat_params)

            def one(i):
                pred, _, _, _ = model.apply(params, a_norm_all[i],
                                            u_lr=u_lr_all[i],
                                            a_norm=a_norm_all[i])
                pred = unpad(pred, cfg.padding)
                gt = fill_diagonal(hr_all[i], 1.0)
                return jnp.mean(jnp.abs(pred - gt)), pred

            maes, preds = jax.vmap(one)(idx)
            mae = jnp.sum(maes * valid) / jnp.maximum(valid.sum(), 1.0)
            return mae, preds

        return jax.vmap(fold_eval, in_axes=(0, 0, 0))(
            flat_params_f, idxs_f, valid_f)

    return model, template, unravel, train_all, eval_all


@lru_cache(maxsize=32)
def _build_programs(cfg: GSRTrainConfig, epochs: int = None, mesh=None):
    """Jitted train / eval programs.

    With ``mesh`` (a 1-D ``('batch',)`` jax.sharding.Mesh) the FOLD axis is
    sharded over the devices and the dataset is replicated: k-fold CV is
    embarrassingly parallel (one independent model per fold), so the
    partitioned program needs ZERO collectives — each device trains its
    fold(s) locally, which is the ideal ICI layout for this workload
    (SURVEY §2.3: the scaling axis is the subject/fold batch; the model
    itself is a sliver of one core's HBM). Requires the (padded) fold count
    to be a multiple of the mesh size; GSRFoldRunner pads with masked
    no-op folds.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    model, template, unravel, train_all, eval_all = _build_raw_programs(
        cfg, epochs)
    if mesh is None:
        # AOT executable disk cache (utils/aot_cache.py): a fresh
        # process skips the client lower+compile of the big
        # fold-parallel programs (measured ~14 s for the same-class GAT
        # chunk program — PERF.md); plain jit on any failure. ``epochs``
        # is baked into the scan, not the operands, so it must be part
        # of the tag — two epoch counts can share argument shapes.
        from fcsr_tpu.utils.aot_cache import wrap
        tag = f"{cfg!r}|ep={epochs}"
        return model, template, unravel, \
            wrap(f"gsr_train|{tag}", jax.jit(train_all)), \
            wrap(f"gsr_eval|{tag}", jax.jit(eval_all))

    fold = NamedSharding(mesh, P("batch"))
    rep = NamedSharding(mesh, P())
    state_sh = (fold, fold, fold, fold)
    train_sharded = jax.jit(
        train_all,
        in_shardings=(state_sh, rep, rep, rep, rep, fold, fold),
        out_shardings=(state_sh, fold, fold))
    eval_sharded = jax.jit(
        eval_all,
        in_shardings=(fold, rep, rep, rep, fold, fold),
        out_shardings=(fold, fold))
    return model, template, unravel, train_sharded, eval_sharded


def _pad_plans(folds, which: int, pad_to: int = None):
    """(F, L) padded index + validity arrays for fold element ``which``
    (0 = train indices, 1 = val indices)."""
    sets = [np.asarray(f[which], dtype=np.int32) for f in folds]
    max_len = pad_to or max(len(s) for s in sets)
    idxs, valids = [], []
    for s in sets:
        pad = max_len - len(s)
        idxs.append(np.concatenate([s, np.zeros(pad, np.int32)]))
        valids.append(np.concatenate([np.ones(len(s), np.float32),
                                      np.zeros(pad, np.float32)]))
    return np.stack(idxs), np.stack(valids)


def stage_dataset(cfg: GSRTrainConfig, lr_all, hr_all, mesh=None):
    """Host-side precompute (normalized adjacency + spectral) + one-shot
    flat-staged transfer to HBM. Ships a_norm (what the model actually
    consumes) instead of raw lr. Returns device-resident arrays
    (a_norm, hr, u_lr, u_hr_reduced); with ``mesh`` the dataset is
    replicated across the mesh devices (per-fold selection happens inside
    the partitioned program, so replication is what the zero-collective
    fold layout wants)."""
    from fcsr_tpu.core.normalize import normalize_adj_np

    lr_np = np.asarray(lr_all, dtype=np.float32)
    hr_np = np.asarray(hr_all, dtype=np.float32)
    a_norm = normalize_adj_np(lr_np).astype(np.float32)
    u_lr, u_hr = precompute_spectral(lr_np, hr_np, lr_dim=cfg.lr_dim,
                                     padding=cfg.padding, a_norm=a_norm)
    arrays = (a_norm, hr_np, np.asarray(u_lr, dtype=np.float32),
              np.asarray(u_hr, dtype=np.float32))
    if mesh is None:
        return tuple(device_put_fast(a) for a in arrays)
    from jax.sharding import NamedSharding, PartitionSpec as P
    rep = NamedSharding(mesh, P())
    return tuple(jax.device_put(a, rep) for a in arrays)


class GSRFoldRunner:
    """Stateful convenience wrapper: stage once, train/eval many times
    (keeps everything device-resident between calls — the layout a bench
    or a hyperparameter sweep wants).

    ``mesh`` (optional 1-D ``('batch',)`` mesh) shards the fold axis over
    the devices — the production multi-chip path. Fold count is padded to a
    multiple of the mesh size with fully-masked no-op folds; all returned
    histories/metrics are sliced back to the real folds. Per-fold
    trajectories are identical to the single-device run (asserted in
    tests/test_parallel.py)."""

    def __init__(self, cfg: GSRTrainConfig, lr_all, hr_all, folds,
                 init_seed: int = 0, mesh=None):
        self.cfg = cfg
        self.folds = folds
        self.mesh = mesh
        self.n_folds = len(folds)
        # run fingerprint: config + fold plan + dataset content. Stored in
        # checkpoint blobs so a stale file from a different run (other
        # FCSR_BENCH_SPLITS, other dataset flavor, other epochs) is
        # detected and discarded instead of silently restored.
        n_pad_folds = 0
        if mesh is not None:
            n_pad_folds = (-len(folds)) % mesh.devices.size
        self._n_total = self.n_folds + n_pad_folds
        h = hashlib.blake2b(digest_size=8)
        h.update(repr(cfg).encode())
        h.update(repr(init_seed).encode())
        # the padded fold-axis size is part of the state SHAPE: a blob
        # written under a different device count must be discarded, not
        # restored into a mismatched vmapped program
        h.update(repr(self._n_total).encode())
        for tr, va in folds:
            h.update(np.asarray(tr, np.int64).tobytes())
            h.update(np.asarray(va, np.int64).tobytes())
        for a in (lr_all, hr_all):
            a = np.ascontiguousarray(np.asarray(a, dtype=np.float32))
            h.update(str(a.shape).encode())
            h.update(a.tobytes())
        self.fingerprint = h.hexdigest()
        (self.model, self.template, self.unravel, self._train_all,
         self._eval_all) = _build_programs(cfg, mesh=mesh)
        self.data = stage_dataset(cfg, lr_all, hr_all, mesh=mesh)
        pad_folds = folds + [(np.zeros(1, np.int32),) * 2] * n_pad_folds
        self.tr_idx, self.tr_valid = _pad_plans(pad_folds, 0)
        self.va_idx, self.va_valid = _pad_plans(pad_folds, 1)
        if n_pad_folds:  # masked no-op folds: every step/eval slot invalid
            self.tr_valid[self.n_folds:] = 0.0
            self.va_valid[self.n_folds:] = 0.0
        def _init_folds():
            eye = jnp.eye(cfg.lr_dim, dtype=jnp.float32)
            return [ravel_pytree(cfg.model().init(
                jax.random.PRNGKey(init_seed + j), eye, u_lr=eye))[0]
                for j in range(self._n_total)]

        # host-CPU init: eager per-fold init over the TPU tunnel costs
        # seconds of per-op round trips (gat_fixed_cost.py)
        flats = [np.asarray(f) for f in init_on_host(_init_folds)]
        self.flat0 = self._put_folded(jnp.stack([jnp.asarray(f)
                                                 for f in flats]))
        self.tr_idx = self._put_folded(self.tr_idx)
        self.tr_valid = self._put_folded(self.tr_valid)
        self.va_idx = self._put_folded(self.va_idx)
        self.va_valid = self._put_folded(self.va_valid)
        self.flat_trained = None

    def _put_folded(self, arr):
        """Place a leading-fold-axis array (sharded over the mesh when
        multi-chip)."""
        arr = jnp.asarray(arr)
        if self.mesh is None:
            return arr
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.device_put(arr, NamedSharding(self.mesh, P("batch")))

    def fresh_state(self):
        """(params, adam_m, adam_v, step_count) stacked over folds."""
        z = jnp.zeros_like(self.flat0)
        return (self.flat0, z, z,
                self._put_folded(jnp.zeros((self.flat0.shape[0],),
                                           jnp.float32)))

    def _run_chunk(self, state, epochs: int):
        _, _, _, train_chunk, _ = _build_programs(self.cfg, epochs,
                                                  mesh=self.mesh)
        a_norm, hr_all, u_lr, u_hr = self.data
        return train_chunk(state, a_norm, hr_all, u_lr, u_hr,
                           self.tr_idx, self.tr_valid)

    def train(self, checkpoint_path: str = None,
              checkpoint_every: int = None, chunk_epochs: int = None):
        """Full training run.

        ``chunk_epochs`` executes the run as repeated launches of ONE
        ``chunk_epochs``-epoch program instead of a single monolithic
        ``cfg.epochs``-epoch program — trajectory-identical (the state
        round-trips losslessly between launches; verified in tests), but
        the compiled program is ~epochs/chunk_epochs times smaller, which
        cuts the first-execution XLA compile proportionally. State stays
        device-resident between chunks (no host pulls), so steady-state
        throughput is unchanged. This is what bench.py runs.

        With ``checkpoint_path`` the chunked state is additionally
        persisted as exact (params, Adam m/v, step count, epoch) blobs
        between chunks and the run resumes from the file if it exists.
        Blobs carry the runner's fingerprint (config + folds + dataset);
        a stale checkpoint from a different run is discarded with a
        warning instead of restored."""
        a_norm, hr_all, u_lr, u_hr = self.data
        if checkpoint_path is None and chunk_epochs is None:
            state, loss_hist, err_hist = self._train_all(
                self.fresh_state(), a_norm, hr_all, u_lr, u_hr,
                self.tr_idx, self.tr_valid)
            self.flat_trained = state[0]
            return (state[0], loss_hist[:self.n_folds],
                    err_hist[:self.n_folds])

        if checkpoint_path is None:
            # chunked, no I/O: device-resident state between launches
            state = self.fresh_state()
            losses, errs = [], []
            done = 0
            while done < self.cfg.epochs:
                chunk = min(chunk_epochs, self.cfg.epochs - done)
                state, lh, eh = self._run_chunk(state, chunk)
                losses.append(lh)
                errs.append(eh)
                done += chunk
            self.flat_trained = state[0]
            loss_hist = np.concatenate(
                [np.asarray(x)[:self.n_folds] for x in losses], axis=1)
            err_hist = np.concatenate(
                [np.asarray(x)[:self.n_folds] for x in errs], axis=1)
            return state[0], loss_hist, err_hist

        checkpoint_every = checkpoint_every or chunk_epochs or \
            max(1, self.cfg.epochs // 10)
        state = self.fresh_state()
        done = 0
        losses, errs = [], []
        if os.path.exists(checkpoint_path):
            import flax.serialization as ser
            with open(checkpoint_path, "rb") as f:
                blob = ser.msgpack_restore(f.read())
            if (blob.get("fingerprint") == self.fingerprint
                    and int(blob["epoch"]) <= self.cfg.epochs):
                state = tuple(self._put_folded(x) for x in blob["state"])
                done = int(blob["epoch"])
                losses = [np.asarray(blob["loss_hist"])]
                errs = [np.asarray(blob["err_hist"])]
            else:
                import warnings
                warnings.warn(
                    f"checkpoint {checkpoint_path} is from a different "
                    "run (config/folds/dataset fingerprint mismatch) — "
                    "discarding it and training from scratch")
                os.remove(checkpoint_path)

        while done < self.cfg.epochs:
            chunk = min(checkpoint_every, self.cfg.epochs - done)
            state, lh, eh = self._run_chunk(state, chunk)
            losses.append(np.asarray(lh)[:self.n_folds])
            errs.append(np.asarray(eh)[:self.n_folds])
            done += chunk
            import flax.serialization as ser
            blob = {"state": [np.asarray(x) for x in state],
                    "epoch": done,
                    "fingerprint": self.fingerprint,
                    "loss_hist": np.concatenate(losses, axis=1),
                    "err_hist": np.concatenate(errs, axis=1)}
            tmp = checkpoint_path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(ser.msgpack_serialize(blob))
            os.replace(tmp, checkpoint_path)

        self.flat_trained = state[0]
        return (state[0], np.concatenate(losses, axis=1),
                np.concatenate(errs, axis=1))

    def evaluate(self, flat_params_f=None):
        if flat_params_f is None:
            if self.flat_trained is None:
                raise RuntimeError(
                    "GSRFoldRunner.evaluate() called before train(); pass "
                    "params explicitly (e.g. runner.flat0 for the "
                    "untrained models) or train first")
            flat_params_f = self.flat_trained
        lr_all, hr_all, u_lr, _ = self.data
        maes, preds = self._eval_all(flat_params_f, lr_all, hr_all, u_lr,
                                     self.va_idx, self.va_valid)
        return maes[:self.n_folds], preds[:self.n_folds]

    def params_per_fold(self) -> List[dict]:
        return [self.unravel(self.flat_trained[j])
                for j in range(len(self.folds))]


def train_gsr_folds_parallel(cfg: GSRTrainConfig, lr_all, hr_all, folds,
                             init_seed: int = 0,
                             checkpoint_path: str = None,
                             checkpoint_every: int = None, mesh=None):
    """Train one fresh GSR-Net per fold, all folds in parallel.

    With ``mesh`` the folds shard over the devices (zero-collective
    multi-chip layout). Returns (model, per-fold params list, loss_hist
    (F, epochs), err_hist (F, epochs), runner) — the runner keeps
    device-resident state for follow-up evaluation.
    """
    runner = GSRFoldRunner(cfg, lr_all, hr_all, folds, init_seed=init_seed,
                           mesh=mesh)
    p_f, loss_hist, err_hist = runner.train(
        checkpoint_path=checkpoint_path, checkpoint_every=checkpoint_every)
    return (runner.model, runner.params_per_fold(), np.asarray(loss_hist),
            np.asarray(err_hist), runner)


def evaluate_gsr_folds(cfg: GSRTrainConfig, runner: GSRFoldRunner,
                       pull_preds: bool = True):
    """All folds' validation passes in one vmapped call.

    Mirrors the reference test() semantics (HR diagonal set to 1 before
    comparing, ref: utils/gsr_train.py:70). Returns (fold_maes,
    per-fold (preds, gts) lists — empty unless ``pull_preds``).
    """
    maes_d, preds_d = runner.evaluate()
    fold_maes = [float(m) for m in np.asarray(maes_d)]
    outs = []
    if pull_preds:
        from fcsr_tpu.utils.transfer import to_host
        preds_np = to_host(preds_d)
        hr_np = to_host(runner.data[1])
        for j, (_, va) in enumerate(runner.folds):
            n_va = len(va)
            preds = preds_np[j, :n_va]
            gts = hr_np[np.asarray(va)].copy()
            for m in gts:
                np.fill_diagonal(m, 1.0)
            outs.append((preds, gts))
    return fold_maes, outs
