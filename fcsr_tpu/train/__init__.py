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
from fcsr_tpu.train.fast_loop import (  # noqa: F401
    evaluate_gsr_folds,
    train_gsr_folds_parallel,
)
from fcsr_tpu.train.generic_loop import (  # noqa: F401
    PlateauScheduler,
    train_model,
    train_model_folds,
)
from fcsr_tpu.train.gat_loop import (  # noqa: F401
    GATTrainConfig,
    init_gat,
    predict_gat,
    train_gat,
)
