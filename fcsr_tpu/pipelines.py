"""End-to-end pipelines mirroring the reference's notebook entry points."""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import numpy as np

from fcsr_tpu.data.datamodule import kfold_indices
from fcsr_tpu.train.gsr_loop import (
    GSRTrainConfig,
    evaluate_gsr,
    init_gsr,
    precompute_spectral,
    predict_gsr,
    train_gsr_fold,
)

__all__ = ["run_gsr_cv", "run_gsr_cv_fast", "run_mlp_cv", "run_gat_cv",
           "run_gat_cv_fast"]

# predict programs cached per MODEL (flax modules hash by structure) —
# a fresh jax.jit(lambda ...) per pipeline call re-traces the forward on
# every repeat run (see gat_loop._predict_program for the measured cost)
_PREDICT_PROGRAMS: dict = {}


def _fit_cfg_to_data(cfg, lr_all, hr_all):
    """Re-derive a config's node dims from the loaded dataset when they
    mismatch. The reference hardcodes 160/268 (ref: utils/
    preprocessing.py:66) and the config defaults match; reduced-size
    Kaggle-schema CSV sets (CI, tools/make_teacher_csvs.py --tiny) carry
    other resolutions, and mismatched dims can only crash inside the
    model. GSR keeps the reference's hidden_dim == hr_dim coupling
    (ref: training_gsr.ipynb cell-4)."""
    import dataclasses

    lr_dim = int(lr_all.shape[-1])
    hr_dim = int(hr_all.shape[-1])
    if isinstance(cfg, GSRTrainConfig):
        if (cfg.lr_dim, cfg.hr_dim) == (lr_dim, hr_dim):
            return cfg
        return dataclasses.replace(cfg, lr_dim=lr_dim, hr_dim=hr_dim,
                                   hidden_dim=hr_dim)
    if (cfg.n_nodes, cfg.m_nodes) == (lr_dim, hr_dim):
        return cfg
    return dataclasses.replace(cfg, n_nodes=lr_dim, m_nodes=hr_dim)


def _model_predict_program(model):
    fn = _PREDICT_PROGRAMS.get(model)
    if fn is None:
        def fwd(v, x):
            return model.apply(v, x, train=False)
        fn = jax.jit(fwd)
        _PREDICT_PROGRAMS[model] = fn
    return fn


_FOLD_EVAL_PROGRAMS: dict = {}
_INIT_STACK_CACHE: dict = {}


def _mlp_fold_eval_program(model_vec):
    """ONE vmapped program evaluating every fold's val MAE on device:
    gathers each fold's val rows from the staged input/target stacks,
    runs the vector-output forward, and returns (F,) triu-vector MAEs
    (== off-diagonal matrix MAEs exactly; see run_mlp_cv). Cached per
    model so bench steady passes reuse the compiled executable."""
    from functools import partial

    fn = _FOLD_EVAL_PROGRAMS.get(model_vec)
    if fn is None:
        @partial(jax.jit, static_argnums=(4,))
        def ev(stack, x_d, y_d, va_idx, n_tri):
            import jax.numpy as jnp

            def one(v, idx):
                pred = model_vec.apply(v, x_d[idx], train=False)
                return jnp.abs(pred - y_d[idx, :n_tri]).mean()
            return jax.vmap(one, in_axes=(0, 0))(stack, va_idx)
        fn = ev
        _FOLD_EVAL_PROGRAMS[model_vec] = fn
    return fn


def run_mlp_cv(data: Dict[str, np.ndarray], k_folds: int = 3,
               p_val: float = 0.33, num_epochs: int = 100, lr: float = 0.01,
               batch_size: int = 32, n_layers: int = 0,
               hidden: Optional[int] = None, seed: int = 42,
               variant: str = "v2",
               full_metrics: bool = False, eval_backend: str = "device",
               fold_parallel: bool = True,
               verbose: bool = False):
    """MLP k-fold pipeline: contiguous-window folds over one permutation,
    MSE + AdamW + plateau LR, best-state restore, per-fold metrics, final
    test predictions.

    ``variant="v2"`` is the shipped spectral-norm residual MLP
    (ref: training_template.ipynb); ``variant="v1"`` is the plain dense
    MLP baseline (ref: models/mlp.py + old/mlp.ipynb: hidden 10000,
    one hidden block)."""
    from fcsr_tpu.data.datamodule import contiguous_window_folds
    from fcsr_tpu.models.mlp import SpectralResMLP, SuperResMLP
    from fcsr_tpu.train.generic_loop import mse_criterion, train_model
    from fcsr_tpu.train.losses import (make_triu_mse_criterion,
                                       pack_triu_targets)

    lr_all = np.asarray(data["lr_train"], dtype=np.float32)
    hr_all = np.asarray(data["hr_train"], dtype=np.float32)
    n_in = lr_all.shape[-1]
    n_out = hr_all.shape[-1]
    folds = contiguous_window_folds(len(lr_all), k_folds, p_val, seed=seed)

    fold_metrics, fold_losses = [], []
    best = None
    if variant == "v1":
        model = SuperResMLP(input_size=n_in * n_in,
                            output_size=n_out * n_out,
                            hidden_dim=hidden or 10000,
                            n_layers=max(1, n_layers))
        model_train = model
        lr_train_in, hr_train_tgt = lr_all, hr_all
        criterion = mse_criterion
    else:
        hidden = hidden or (n_in + n_out) // 2
        model = SpectralResMLP(num_nodes_input=n_in,
                               num_nodes_output=n_out,
                               num_hidden=hidden, n_layers=n_layers)
        # TRAIN entirely in triu-vector space (identical loss up to float
        # reassociation): the wide output layer's backward fused with the
        # triu scatter is a pathological XLA-TPU compile (see PERF.md
        # 'MLP family'); the pure dense-chain program compiles in seconds.
        # Predictions/eval still use the matrix-output model — the param
        # tree is identical (the scatter has no params).
        model_train = SpectralResMLP(num_nodes_input=n_in,
                                     num_nodes_output=n_out,
                                     num_hidden=hidden, n_layers=n_layers,
                                     output="vector")
        from fcsr_tpu.core.vectorize import triu_indices_rowmajor
        r_in, c_in = triu_indices_rowmajor(n_in)
        lr_train_in = lr_all[:, r_in, c_in]          # (N, L_in)
        hr_train_tgt = pack_triu_targets(hr_all)     # (N, L_out + n)
        criterion = make_triu_mse_criterion(n_out)
    import jax.numpy as jnp

    # ONE jitted prediction forward shared by every fold, the test pass,
    # AND repeat run_mlp_cv calls (flax modules hash by config, so the
    # family bench's steady pass reuses the cold pass's program instead
    # of re-tracing the pathological 35778-wide forward)
    pred_fn = _model_predict_program(model)
    fold_maes = []
    off = ~np.eye(n_out, dtype=bool)

    from fcsr_tpu.utils.transfer import init_on_host

    def fold_init(j):
        # init on the host CPU backend: eager Module.init through the
        # tunnelled TPU runtime is hundreds of per-op round trips
        # (utils/transfer.py::init_on_host)
        return init_on_host(lambda: model.init(
            {"params": jax.random.PRNGKey(seed + j),
             "dropout": jax.random.PRNGKey(seed + 100 + j)},
            np.zeros((2, n_in, n_in), dtype=np.float32)))

    # fold-parallel device control (one vmapped chunk program drives all
    # folds) needs equal train/val sizes — contiguous-window folds have
    # them; fall back to the sequential path otherwise
    # (verbose per-epoch logging lives in the sequential path only)
    sizes = {(len(tr), len(va)) for tr, va in folds}
    fold_results = best_stack = None
    if fold_parallel and not verbose and len(sizes) == 1 and len(folds) > 1:
        from fcsr_tpu.train.generic_loop import train_model_folds

        # seeded inits are deterministic, so the staged stacked tree is
        # memoized per (model, seed, F): repeat passes skip both the
        # eager host inits AND the ~40 MB/fold of host-side stacking
        # (large host copies run at ~120 MB/s on this VM — measured,
        # round 4) and reuse the device-resident tree directly.
        key = (model, seed, len(folds))
        variables_stack = _INIT_STACK_CACHE.get(key)
        if variables_stack is None:
            import jax.numpy as jnp

            from fcsr_tpu.utils.transfer import (device_put_tree_fast,
                                                 init_on_host)

            # one jitted VMAPPED init on the host CPU backend produces
            # the stacked tree directly — bit-identical to F separate
            # inits (tested), with no 100+ MB host-side np.stack (this
            # VM's large-copy bandwidth is ~120 MB/s) and no per-fold
            # eager dispatch chains
            def _stacked_init():
                kp = jnp.stack([jax.random.PRNGKey(seed + j)
                                for j in range(len(folds))])
                kd = jnp.stack([jax.random.PRNGKey(seed + 100 + j)
                                for j in range(len(folds))])
                return jax.jit(jax.vmap(lambda a, b: model.init(
                    {"params": a, "dropout": b},
                    jnp.zeros((2, n_in, n_in), jnp.float32))))(kp, kd)

            variables_stack = device_put_tree_fast(
                init_on_host(_stacked_init), cache=True)
            if len(_INIT_STACK_CACHE) >= 2:
                _INIT_STACK_CACHE.pop(next(iter(_INIT_STACK_CACHE)))
            _INIT_STACK_CACHE[key] = variables_stack
        tr_idx = np.stack([tr for tr, _ in folds])
        va_idx = np.stack([va for _, va in folds])
        fold_results, best_stack = train_model_folds(
            model_train, variables_stack,
            lr_train_in[tr_idx], hr_train_tgt[tr_idx],
            lr_train_in[va_idx], hr_train_tgt[va_idx],
            seeds=[seed + j for j in range(len(folds))],
            num_epochs=num_epochs, lr=lr, batch_size=batch_size,
            criterion=criterion, return_stacked=True)

    from fcsr_tpu.utils.transfer import device_put_fast, stage_cached, to_host

    # fold val MAEs: with the stacked best trees and a vector-output
    # model the whole evaluation is ONE vmapped dispatch returning F
    # scalars — the off-diagonal matrix MAE equals the triu-vector MAE
    # exactly (every off-diag |diff| appears twice in both numerator and
    # denominator), so nothing larger than (F,) crosses the link. The
    # full_metrics path needs dense predictions on host; it keeps the
    # per-fold predict pulls.
    maes_f = None
    if best_stack is not None and variant != "v1" and not full_metrics:
        eval_fn = _mlp_fold_eval_program(model_train)
        x_d = stage_cached(lr_train_in)
        y_d = stage_cached(hr_train_tgt)
        n_tri = (n_out * (n_out - 1)) // 2
        maes_f = np.asarray(eval_fn(best_stack, x_d, y_d,
                                    device_put_fast(va_idx), n_tri))

    for j, (tr, va) in enumerate(folds):
        if fold_results is not None:
            tr_h, va_h, lr_h, variables = fold_results[j]
        else:
            variables = fold_init(j)
            tr_h, va_h, lr_h, variables = train_model(
                model_train, variables, lr_train_in[tr], hr_train_tgt[tr],
                lr_train_in[va], hr_train_tgt[va], num_epochs=num_epochs,
                lr=lr, batch_size=batch_size, criterion=criterion,
                seed=seed + j, verbose=verbose)
        fold_losses.append((tr_h, va_h, lr_h))
        if maes_f is not None:
            fold_maes.append(float(maes_f[j]))
        else:
            # the matrix model accepts already-vectorized (B, L) rows, so
            # only 2-D buffers cross the link (3-D device_put is the
            # pathological tiled-relayout path — utils/transfer.py)
            x_va = lr_all[va] if variant == "v1" else lr_train_in[va]
            preds = to_host(pred_fn(variables, device_put_fast(x_va)))
            fold_maes.append(float(
                np.abs(preds[:, off] - hr_all[va][:, off]).mean()))
            if full_metrics:
                from fcsr_tpu.evalx.report import print_metrics
                fold_metrics.append(print_metrics(hr_all[va], preds,
                                                  fold_i=j,
                                                  backend=eval_backend,
                                                  write_file=False,
                                                  verbose=verbose))
        best = variables

    test_preds = None
    if data.get("lr_test") is not None:
        lr_test = np.asarray(data["lr_test"], dtype=np.float32)
        x_test = lr_test if variant == "v1" else lr_test[:, r_in, c_in]
        test_preds = to_host(pred_fn(best, device_put_fast(x_test)))
    return {"model": model, "variables": best, "fold_metrics": fold_metrics,
            "fold_maes": fold_maes, "mean_mae": float(np.mean(fold_maes)),
            "histories": fold_losses, "test_preds": test_preds}


def run_gat_cv(data: Dict[str, np.ndarray], splits: int = 3,
               seed: int = 42, cfg=None, full_metrics: bool = False,
               eval_backend: str = "device", verbose: bool = False):
    """GAT Graph-U-Net 3-fold pipeline
    (ref: unet-transformer.py:478-541): sklearn KFold(shuffle, seed 42),
    fresh model per fold, intermediate-loss training, per-fold metrics."""
    from fcsr_tpu.data.datamodule import kfold_indices
    from fcsr_tpu.train.gat_loop import (GATTrainConfig, init_gat,
                                         predict_gat, train_gat)

    cfg = cfg or GATTrainConfig()
    lr_all = np.asarray(data["lr_train"], dtype=np.float32)
    hr_all = np.asarray(data["hr_train"], dtype=np.float32)
    cfg = _fit_cfg_to_data(cfg, lr_all, hr_all)
    folds = kfold_indices(len(lr_all), splits, seed=seed)

    fold_metrics, histories = [], []
    variables = model = None
    for j, (tr, va) in enumerate(folds):
        model, variables, tx, opt = init_gat(cfg,
                                             jax.random.PRNGKey(seed + j))
        variables, opt, hist = train_gat(variables, opt, model, tx, cfg,
                                         lr_all[tr], hr_all[tr],
                                         lr_all[va], hr_all[va],
                                         seed=seed + j, verbose=verbose)
        histories.append(hist)
        preds = np.asarray(predict_gat(variables, model, cfg, lr_all[va]))
        if full_metrics:
            from fcsr_tpu.evalx.report import print_metrics
            fold_metrics.append(print_metrics(hr_all[va], preds, fold_i=j,
                                              backend=eval_backend,
                                              write_file=False,
                                              verbose=verbose))

    test_preds = None
    if data.get("lr_test") is not None and variables is not None:
        test_preds = np.asarray(predict_gat(variables, model, cfg,
                                            data["lr_test"]))
    return {"model": model, "variables": variables, "cfg": cfg,
            "fold_metrics": fold_metrics, "histories": histories,
            "test_preds": test_preds}


def run_gat_cv_fast(data: Dict[str, np.ndarray],
                    cfg=None, splits: int = 3, seed: int = 42,
                    full_metrics: bool = False,
                    eval_backend: str = "device", verbose: bool = False,
                    host_control: bool = False, multichip: bool = False):
    """Fold-parallel GAT CV: all folds in one vmapped program (see
    train/gat_loop.py::train_gat_folds_parallel; control — plateau
    scheduler, best-state, early stop — runs on device unless
    ``host_control``). ``multichip=True`` shards the fold axis over all
    local devices (zero-collective layout, like run_gsr_cv_fast). Same
    result-dict shape as run_gat_cv."""
    import jax

    from fcsr_tpu.train.gat_loop import (GATTrainConfig, predict_gat,
                                         train_gat_folds_parallel)

    cfg = cfg or GATTrainConfig()
    lr_all = np.asarray(data["lr_train"], dtype=np.float32)
    hr_all = np.asarray(data["hr_train"], dtype=np.float32)
    cfg = _fit_cfg_to_data(cfg, lr_all, hr_all)
    folds = kfold_indices(len(lr_all), splits, seed=seed)

    mesh = None
    if multichip:
        from fcsr_tpu.parallel import batch_mesh
        devices = jax.devices()
        mesh = batch_mesh(devices[:min(len(devices), splits)])

    t0 = time.perf_counter()
    model, best_vars, histories = train_gat_folds_parallel(
        cfg, lr_all, hr_all, folds, seed=seed, verbose=verbose,
        host_control=host_control, mesh=mesh)
    t_train = time.perf_counter() - t0

    # all folds' validation evaluation in ONE cached jitted program —
    # the LR stack staging is shared with the trainer's
    # (stage_lr_cached). Without full_metrics only (F,) MAE scalars come
    # back (predict_gat_folds_mae); the dense prediction stacks are
    # pulled only when the host metric suite needs them.
    t0 = time.perf_counter()
    from fcsr_tpu.train.gat_loop import (precompute_gat_features,
                                         predict_gat_folds,
                                         predict_gat_folds_mae,
                                         stage_lr_cached)
    from fcsr_tpu.utils.transfer import stage_cached, to_host

    lr_d = stage_lr_cached(lr_all)
    x_d = precompute_gat_features(lr_all, dim=cfg.dim)
    va_len = max(len(va) for _, va in folds)
    va_idx = np.zeros((len(folds), va_len), np.int32)
    for j, (_, va) in enumerate(folds):
        va_idx[j, :len(va)] = np.asarray(va, np.int32)

    fold_metrics = []
    if full_metrics:
        preds_f = to_host(predict_gat_folds(model, best_vars, lr_d, x_d,
                                            va_idx))
        fold_maes = []
        for j, (tr, va) in enumerate(folds):
            preds = preds_f[j, :len(va)]
            gts = hr_all[va]
            off = ~np.eye(gts.shape[-1], dtype=bool)
            fold_maes.append(float(
                np.abs(preds[:, off] - gts[:, off]).mean()))
            from fcsr_tpu.evalx.report import print_metrics
            fold_metrics.append(print_metrics(gts, preds, fold_i=j,
                                              backend=eval_backend,
                                              write_file=False,
                                              verbose=verbose))
    else:
        hr_d = stage_cached(hr_all)
        maes_f = np.asarray(predict_gat_folds_mae(
            model, best_vars, lr_d, x_d, va_idx, hr_d,
            [len(va) for _, va in folds]))
        fold_maes = [float(m) for m in maes_f]
    t_predict = time.perf_counter() - t0

    test_preds = None
    if data.get("lr_test") is not None:
        test_preds = to_host(predict_gat(best_vars[-1], model, cfg,
                                         data["lr_test"]))
    return {"model": model, "variables": best_vars[-1],
            "variables_per_fold": best_vars, "cfg": cfg,
            "fold_maes": fold_maes, "mean_mae": float(np.mean(fold_maes)),
            "fold_metrics": fold_metrics, "histories": histories,
            "test_preds": test_preds,
            "timings": {"train": t_train, "predict": t_predict}}


def run_gsr_cv_fast(data: Dict[str, np.ndarray],
                    cfg: Optional[GSRTrainConfig] = None,
                    splits: int = 3, seed: int = 42, init_seed: int = 0,
                    full_metrics: bool = False,
                    eval_backend: str = "device",
                    checkpoint_path: Optional[str] = None,
                    checkpoint_every: Optional[int] = None,
                    multichip: bool = False):
    """Performance path: clean-CV (fresh model per fold) with all folds
    trained in ONE vmapped program and a flat-vector Adam — see
    fast_loop.py for why this is exact per-fold math, not an
    approximation. ``multichip=True`` shards the fold axis over all local
    devices (zero-collective layout; per-fold math identical — see
    tests/test_parallel.py). Returns the same result dict shape as
    run_gsr_cv."""
    from fcsr_tpu.train.fast_loop import (evaluate_gsr_folds,
                                          train_gsr_folds_parallel)

    cfg = cfg or GSRTrainConfig()
    lr_all = np.asarray(data["lr_train"], dtype=np.float32)
    hr_all = np.asarray(data["hr_train"], dtype=np.float32)
    cfg = _fit_cfg_to_data(cfg, lr_all, hr_all)
    folds = kfold_indices(len(lr_all), splits, seed=seed)

    mesh = None
    if multichip:
        import jax

        from fcsr_tpu.parallel import batch_mesh
        devices = jax.devices()
        # never use more devices than folds — surplus devices would only
        # host fully-masked padding folds
        mesh = batch_mesh(devices[:min(len(devices), splits)])

    t0 = time.perf_counter()
    model, params_per_fold, loss_hist, err_hist, runner = \
        train_gsr_folds_parallel(cfg, lr_all, hr_all, folds,
                                 init_seed=init_seed,
                                 checkpoint_path=checkpoint_path,
                                 checkpoint_every=checkpoint_every,
                                 mesh=mesh)
    t_train = time.perf_counter() - t0

    t0 = time.perf_counter()
    fold_maes, fold_outs = evaluate_gsr_folds(cfg, runner,
                                              pull_preds=full_metrics)
    t_eval = time.perf_counter() - t0

    fold_metrics = []
    if full_metrics:
        from fcsr_tpu.evalx.report import print_metrics
        for j, (preds, gts) in enumerate(fold_outs):
            fold_metrics.append(print_metrics(gts, preds, fold_i=j,
                                              backend=eval_backend,
                                              write_file=False,
                                              verbose=False))

    test_preds = None
    if data.get("lr_test") is not None:
        from fcsr_tpu.train.gsr_loop import predict_gsr
        test_preds = np.asarray(predict_gsr(params_per_fold[-1], model,
                                            cfg, data["lr_test"]))

    return {
        "fold_maes": fold_maes,
        "mean_mae": float(np.mean(fold_maes)),
        "fold_metrics": fold_metrics,
        "params": params_per_fold[-1],
        "params_per_fold": params_per_fold,
        "runner": runner,
        "model": model,
        "cfg": cfg,
        "test_preds": test_preds,
        "loss_hist": loss_hist,
        "timings": {"train": t_train, "eval": t_eval},
        "n_train_steps": sum(len(tr) for tr, _ in folds) * cfg.epochs,
        "n_eval_forwards": sum(len(va) for _, va in folds),
    }


def run_gsr_cv(data: Dict[str, np.ndarray],
               cfg: Optional[GSRTrainConfig] = None,
               splits: int = 5, seed: int = 42, init_seed: int = 0,
               reset_per_fold: bool = False, eval_backend: str = "device",
               full_metrics: bool = False, verbose: bool = False):
    """K-fold cross-validated GSR-Net training
    (ref: training_gsr.ipynb cells 4-7).

    Faithful quirk: the reference constructs the model and optimizer ONCE
    and keeps training the same weights across folds (so later folds see
    data that was previously validation) — ``reset_per_fold=False``
    replicates that; ``True`` gives clean per-fold models.

    Returns a dict with per-fold val MAE, optional full metric dicts,
    test-set predictions and timing breakdown.
    """
    cfg = cfg or GSRTrainConfig()
    lr_all = np.asarray(data["lr_train"], dtype=np.float32)
    hr_all = np.asarray(data["hr_train"], dtype=np.float32)
    cfg = _fit_cfg_to_data(cfg, lr_all, hr_all)
    folds = kfold_indices(len(lr_all), splits, seed=seed)

    key = jax.random.PRNGKey(init_seed)
    model, params, tx, opt_state = init_gsr(cfg, key)

    # All spectral precomputes in one batched shot (train+val reuse slices).
    t0 = time.perf_counter()
    u_lr_all, u_hr_all = jax.tree_util.tree_map(
        np.asarray, precompute_spectral(lr_all, hr_all, lr_dim=cfg.lr_dim,
                                        padding=cfg.padding))
    t_spectral = time.perf_counter() - t0

    fold_maes = []
    fold_metrics = []
    t_train = t_eval = 0.0
    for j, (tr, va) in enumerate(folds):
        if reset_per_fold:
            model, params, tx, opt_state = init_gsr(
                cfg, jax.random.PRNGKey(init_seed + j))
        t0 = time.perf_counter()
        params, opt_state, hist = train_gsr_fold(
            params, opt_state, model, tx, cfg, lr_all[tr], hr_all[tr],
            spectral=(u_lr_all[tr], u_hr_all[tr]), verbose=verbose)
        t_train += time.perf_counter() - t0

        t0 = time.perf_counter()
        mae, preds, gts = evaluate_gsr(params, model, cfg,
                                       lr_all[va], hr_all[va],
                                       verbose=verbose)
        fold_maes.append(mae)
        if full_metrics:
            from fcsr_tpu.evalx.report import print_metrics
            fold_metrics.append(print_metrics(gts, preds, fold_i=j,
                                              backend=eval_backend,
                                              write_file=False,
                                              verbose=verbose))
        t_eval += time.perf_counter() - t0

    test_preds = None
    if data.get("lr_test") is not None:
        test_preds = np.asarray(predict_gsr(params, model, cfg,
                                            data["lr_test"]))

    return {
        "fold_maes": fold_maes,
        "mean_mae": float(np.mean(fold_maes)),
        "fold_metrics": fold_metrics,
        "params": params,
        "model": model,
        "cfg": cfg,
        "test_preds": test_preds,
        "timings": {"spectral": t_spectral, "train": t_train,
                    "eval": t_eval},
        "n_train_steps": sum(len(tr) for tr, _ in folds) * cfg.epochs,
        "n_eval_forwards": sum(len(va) for _, va in folds),
    }
