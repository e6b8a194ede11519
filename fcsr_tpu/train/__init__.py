from fcsr_tpu.train.losses import (  # noqa: F401
    gsr_composite_loss,
    l1,
    offdiag_mse_loss,
)
from fcsr_tpu.train.gsr_loop import (  # noqa: F401
    GSRTrainConfig,
    evaluate_gsr,
    init_gsr,
    precompute_spectral,
    predict_gsr,
    train_gsr_fold,
)
