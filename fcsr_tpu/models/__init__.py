from fcsr_tpu.models.gsr import (  # noqa: F401
    GCN,
    GraphConvolution,
    GraphPool,
    GraphUnet,
    GraphUnpool,
    GSRLayer,
    GSRNet,
    pool_sizes,
)
