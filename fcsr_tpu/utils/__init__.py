from fcsr_tpu.utils.reproducibility import seed_everything, set_seed  # noqa: F401
from fcsr_tpu.utils.profiling import PhaseTimer, trace_if_enabled  # noqa: F401
from fcsr_tpu.utils.compile_cache import enable_persistent_cache  # noqa: F401
