from fcsr_tpu.iox.submission import save_prediction, submission_frame  # noqa: F401
from fcsr_tpu.iox.checkpoint import load_pytree, save_pytree  # noqa: F401
from fcsr_tpu.iox.torch_interop import (  # noqa: F401
    flax_to_reference_state, reference_state_to_flax)
