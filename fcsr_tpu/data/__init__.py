from fcsr_tpu.data.io import (  # noqa: F401
    has_real_csvs,
    load_csv_vectors,
    load_dataset,
    load_or_synthesize,
    matrix_size_for,
    write_kaggle_csvs,
)
from fcsr_tpu.data.synthetic import synthesize_paired_connectomes  # noqa: F401
from fcsr_tpu.data.datamodule import (  # noqa: F401
    ConnectomeDataModule,
    contiguous_window_folds,
    kfold_indices,
    train_val_split,
)
