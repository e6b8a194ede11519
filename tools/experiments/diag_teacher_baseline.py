import jax, numpy as np, time
import os
cache_dir = os.path.expanduser("~/.cache/fcsr_jax")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from fcsr_tpu.data.synthetic import synthesize_teacher_connectomes
from fcsr_tpu.data.datamodule import kfold_indices
from fcsr_tpu.train import GSRTrainConfig
from fcsr_tpu.train.fast_loop import GSRFoldRunner, evaluate_gsr_folds

lr, hr = synthesize_teacher_connectomes(167, hr_noise=0.005, seed=42)
cfg = GSRTrainConfig(epochs=200)
folds = kfold_indices(167, 3, seed=42)
runner = GSRFoldRunner(cfg, lr, hr, folds)
_, loss_hist, err_hist = runner.train()
eh = np.asarray(err_hist)
print("train err trajectory (fold0):", [round(float(x),4) for x in eh[0, ::20]], "final", float(eh[0,-1]))
maes, outs = evaluate_gsr_folds(cfg, runner)
print("val maes:", maes)
preds, gts = outs[0]
print("pred mean/std:", preds.mean(), preds.std(), "gt mean/std:", gts.mean(), gts.std())
mean_hr = hr[folds[0][0]].mean(axis=0); np.fill_diagonal(mean_hr, 1.0)
print("baseline MAE fold0:", np.abs(gts - mean_hr[None]).mean())
# how well does pred correlate with gt pattern?
off = ~np.eye(268, dtype=bool)
p = preds[:, off].ravel(); g = gts[:, off].ravel()
print("corr(pred, gt):", np.corrcoef(p, g)[0,1])
print("corr(pred_dev, gt_dev) subject-deviation:",
      np.corrcoef((preds - preds.mean(0))[:, off].ravel(),
                  (gts - gts.mean(0))[:, off].ravel())[0,1])
