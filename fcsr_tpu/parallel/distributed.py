"""Multi-host bootstrap.

Single-host multi-chip needs nothing beyond the ('batch',) mesh
(parallel/mesh.py); multi-host pods additionally need
``jax.distributed.initialize`` so all hosts join one runtime, with the
dataset sharded across hosts over DCN and gradients reduced over ICI.
The reference has no distributed story at all (SURVEY §2.3).
"""

from __future__ import annotations

import os
from typing import Optional

__all__ = ["maybe_initialize_distributed", "host_shard_slice"]


def maybe_initialize_distributed(coordinator: Optional[str] = None,
                                 num_processes: Optional[int] = None,
                                 process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when multi-host env/args are present;
    no-op (returns False) for single-host runs. Env fallbacks:
    FCSR_COORDINATOR, FCSR_NUM_PROCESSES, FCSR_PROCESS_ID (or the
    standard TPU pod env detection inside jax when args are all None but
    FCSR_DISTRIBUTED=1)."""
    import jax

    coordinator = coordinator or os.environ.get("FCSR_COORDINATOR")
    num_processes = num_processes or _env_int("FCSR_NUM_PROCESSES")
    process_id = process_id if process_id is not None \
        else _env_int("FCSR_PROCESS_ID")

    if coordinator and num_processes:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id or 0)
        return True
    if os.environ.get("FCSR_DISTRIBUTED") == "1":
        jax.distributed.initialize()  # TPU pod auto-detection
        return True
    return False


def _env_int(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v else None


def host_shard_slice(n: int):
    """This host's contiguous slice of an n-sample dataset (sharded over
    DCN: each host loads only its shard; device sharding within the host
    rides ICI)."""
    import jax

    pid = jax.process_index()
    count = jax.process_count()
    per = -(-n // count)
    lo = min(pid * per, n)
    hi = min(lo + per, n)
    return slice(lo, hi)
