"""Tests for the GraphSAGE-interpolate baseline, submission writer, and
checkpointing (ref: models/upsample.py, utils/data.py:212-233)."""

import jax
import jax.numpy as jnp
import numpy as np

from fcsr_tpu.iox import load_pytree, save_prediction, save_pytree
from fcsr_tpu.models.upsample import (
    GraphSAGEUpsampler,
    linear_interp_matrix,
)
from fcsr_tpu.core.vectorize import MatrixVectorizer
from tests.conftest import random_symmetric


def test_linear_interp_matches_torch(rng):
    """Our dense interp matrix replicates
    torch.nn.functional.interpolate(mode='linear', align_corners=False)."""
    import torch
    n_in, n_out, c = 12, 20, 3
    x = rng.random((1, c, n_in)).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(n_out,), mode="linear").numpy()
    w = np.asarray(linear_interp_matrix(n_in, n_out))
    got = np.einsum("bcn,nm->bcm", x, w)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # and downsampling
    w2 = np.asarray(linear_interp_matrix(n_out, n_in))
    x2 = rng.random((1, c, n_out)).astype(np.float32)
    want2 = torch.nn.functional.interpolate(
        torch.from_numpy(x2), size=(n_in,), mode="linear").numpy()
    got2 = np.einsum("bcn,nm->bcm", x2, w2)
    np.testing.assert_allclose(got2, want2, atol=1e-6)


def test_graphsage_upsampler_forward(rng):
    model = GraphSAGEUpsampler(hidden_channels=8, out_size=18, n_layers=2)
    a = jnp.asarray(np.stack([random_symmetric(rng, 12) for _ in range(3)]))
    variables = model.init(jax.random.PRNGKey(0), a)
    out = np.asarray(model.apply(variables, a))
    assert out.shape == (3, 18, 18)
    # sigmoid + hard threshold at 0.2
    assert np.all((out == 0) | (out > 0.2))
    assert np.all(out <= 1.0)


def test_submission_orderings(rng, tmp_path):
    preds = np.stack([random_symmetric(rng, 9) for _ in range(2)])
    f1 = tmp_path / "sub_col.csv"
    flat = save_prediction(preds, str(f1), ordering="colmajor")
    # column-major equals MatrixVectorizer.vectorize concatenation
    want = np.concatenate([MatrixVectorizer.vectorize(p) for p in preds])
    np.testing.assert_allclose(flat, want, atol=1e-7)

    import pandas as pd
    df = pd.read_csv(f1)
    assert list(df.columns) == ["ID", "Predicted"]
    assert df["ID"].iloc[0] == 1 and len(df) == 2 * 36

    f2 = tmp_path / "sub_row.csv"
    flat2 = save_prediction(preds, str(f2), ordering="rowmajor")
    want2 = np.concatenate([p[np.triu_indices(9, k=1)] for p in preds])
    np.testing.assert_allclose(flat2, want2, atol=1e-7)
    assert not np.allclose(flat, flat2)  # orderings genuinely differ


def test_checkpoint_roundtrip(tmp_path):
    tree = {"params": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
                       "b": jnp.zeros(3)},
            "step": jnp.asarray(7)}
    path = str(tmp_path / "ckpt.msgpack")
    save_pytree(tree, path)
    template = jax.tree_util.tree_map(jnp.zeros_like, tree)
    restored = load_pytree(template, path)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(tree["params"]["w"]))
    assert int(restored["step"]) == 7
