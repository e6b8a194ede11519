from fcsr_tpu.native.csv_reader import (  # noqa: F401
    fast_csv_available,
    read_csv_float32,
)
