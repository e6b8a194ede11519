from fcsr_tpu.evalx.metrics import (  # noqa: F401
    jensen_shannon_distance,
    mae,
    pearson_corr,
    weight_histogram_kl,
)
from fcsr_tpu.evalx.centrality import (  # noqa: F401
    betweenness_centrality,
    core_number,
    eigenvector_centrality,
    pagerank,
    weighted_kcore_scores,
)
from fcsr_tpu.evalx.report import (  # noqa: F401
    evaluate_metrics,
    evaluate_pair_stacks,
    print_metrics,
)
