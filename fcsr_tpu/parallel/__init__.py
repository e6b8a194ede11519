from fcsr_tpu.parallel.mesh import (  # noqa: F401
    batch_mesh,
    make_sharded_batch_step,
    make_sharded_generic_step,
    shard_batch,
)
