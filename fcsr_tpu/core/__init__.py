from fcsr_tpu.core.vectorize import (  # noqa: F401
    MatrixVectorizer,
    anti_vectorize,
    anti_vectorize_batch,
    triu_indices_colmajor,
    triu_indices_rowmajor,
    vec_len,
    vectorize,
    vectorize_batch,
    vectorize_rowmajor,
)
from fcsr_tpu.core.normalize import (  # noqa: F401
    fill_diagonal,
    normalize_adj,
    pad_hr_adj,
    symmetric_normalize,
    symmetrize,
    unpad,
)
