"""Device ingestion pipeline: CSV -> vectors -> fused Pallas
materialization (interpret mode on the CPU test platform)."""

import numpy as np

from fcsr_tpu.core.normalize import normalize_adj
from fcsr_tpu.core.vectorize import anti_vectorize_batch, vec_len
from fcsr_tpu.data.device_pipeline import (
    ingest_vectors_to_device,
    load_dataset_device,
)


def test_ingest_matches_host_path(rng):
    n = 24
    vecs = rng.random((5, vec_len(n))).astype(np.float32)
    got = np.asarray(ingest_vectors_to_device(vecs, n, interpret=True))
    want = np.asarray(anti_vectorize_batch(vecs, n))
    np.testing.assert_allclose(got, want, atol=1e-6)

    got_norm = np.asarray(ingest_vectors_to_device(vecs, n, normalize=True,
                                                   interpret=True))
    want_norm = np.asarray(normalize_adj(want))
    np.testing.assert_allclose(got_norm, want_norm, atol=1e-5)


def test_load_dataset_device(rng, tmp_path):
    import pandas as pd
    for name, size, count in (("lr_train", 160, 3), ("hr_train", 268, 3),
                              ("lr_test", 160, 2)):
        df = pd.DataFrame(
            rng.random((count, vec_len(size))).astype(np.float32))
        df.insert(0, "ID", range(count))
        df.to_csv(tmp_path / f"{name}.csv", index=False)
    d = load_dataset_device(str(tmp_path), interpret=True)
    assert d["lr_train"].shape == (3, 160, 160)
    assert d["hr_train"].shape == (3, 268, 268)
    assert d["lr_test"].shape == (2, 160, 160)
    lr0 = np.asarray(d["lr_train"])[0]
    np.testing.assert_allclose(lr0, lr0.T, atol=1e-6)
