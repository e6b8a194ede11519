import jax, numpy as np, os
cache_dir = os.path.expanduser("~/.cache/fcsr_jax")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from fcsr_tpu.data.synthetic import synthesize_teacher_connectomes
from fcsr_tpu.data.datamodule import kfold_indices
from fcsr_tpu.train import GSRTrainConfig
from fcsr_tpu.train.fast_loop import GSRFoldRunner, evaluate_gsr_folds

lr, hr = synthesize_teacher_connectomes(167, hr_noise=0.005, seed=42)
folds = kfold_indices(167, 3, seed=42)
mean0 = hr[folds[0][0]].mean(axis=0); np.fill_diagonal(mean0, 1.0)

for LR in (1e-3, 3e-3):
    cfg = GSRTrainConfig(epochs=200, lr=LR)
    runner = GSRFoldRunner(cfg, lr, hr, folds)
    _, loss_hist, err_hist = runner.train()
    eh = np.asarray(err_hist)
    maes, outs = evaluate_gsr_folds(cfg, runner)
    preds, gts = outs[0]
    sd = np.corrcoef((preds - preds.mean(0)).ravel(), (gts - gts.mean(0)).ravel())[0,1]
    print(f"lr={LR}: val maes={[round(m,5) for m in maes]} "
          f"final_train_err={float(eh[0,-1]):.5f} "
          f"baselineMAE_f0={np.abs(gts - mean0[None]).mean():.5f} subj_dev_corr={sd:.3f}")
