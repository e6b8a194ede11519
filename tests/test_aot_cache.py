"""AOT executable disk cache (utils/aot_cache.py).

The cache must be a pure accelerator: identical results on the
compile-and-serialize pass and the deserialize pass, silent fallback
to the plain jit on corruption or refusal, and default-off on the CPU
test backend (only the tunnelled TPU frontend pays the client compile
the cache removes — PERF.md, measured).
"""
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcsr_tpu.utils import aot_cache


@pytest.fixture()
def aot_env(tmp_path, monkeypatch):
    monkeypatch.setenv("FCSR_AOT_CACHE", "1")
    monkeypatch.setenv("FCSR_AOT_DIR", str(tmp_path))
    return tmp_path


def _toy():
    fn = jax.jit(lambda x, y: (x @ y + 1.0).sum(axis=0))
    x = jnp.full((8, 8), 0.5, jnp.float32)
    y = jnp.arange(64, dtype=jnp.float32).reshape(8, 8)
    return fn, x, y


def test_roundtrip_and_hit(aot_env):
    fn, x, y = _toy()
    want = np.asarray(fn(x, y))

    w1 = aot_cache.wrap("toy|a", fn)
    got1 = np.asarray(w1(x, y))
    blobs = list(aot_env.iterdir())
    assert len(blobs) == 1 and blobs[0].suffix == ".bin"

    # a second wrapper (fresh-process stand-in) takes the deserialize
    # path and must agree bitwise. On backends whose AOT loader cannot
    # execute its own blobs (XLA:CPU in this image) the wrapper instead
    # falls back to the plain jit on the first call — the value
    # contract holds either way, which is the point of the cache.
    w2 = aot_cache.wrap("toy|a", fn)
    got2 = np.asarray(w2(x, y))
    np.testing.assert_array_equal(got1, want)
    np.testing.assert_array_equal(got2, want)
    # repeat call through whatever was memoized stays correct
    np.testing.assert_array_equal(np.asarray(w2(x, y)), want)


def test_ragged_shape_gets_own_executable(aot_env):
    fn, x, y = _toy()
    w = aot_cache.wrap("toy|b", fn)
    w(x, y)
    out = np.asarray(w(x[:4], y))
    np.testing.assert_allclose(out, np.asarray(fn(x[:4], y)), rtol=0,
                               atol=0)
    assert len(w._by_sig) == 2
    assert len(list(aot_env.iterdir())) == 2


def test_corrupt_blob_falls_back_and_heals(aot_env):
    fn, x, y = _toy()
    w = aot_cache.wrap("toy|c", fn)
    w(x, y)
    (blob,) = list(aot_env.iterdir())
    blob.write_bytes(b"not a pickle")
    w2 = aot_cache.wrap("toy|c", fn)
    out = np.asarray(w2(x, y))
    np.testing.assert_array_equal(out, np.asarray(fn(x, y)))
    # the corrupt blob was replaced by a fresh serialize
    (healed,) = list(aot_env.iterdir())
    with open(healed, "rb") as fh:
        pickle.load(fh)  # must parse again


def test_key_separates_tags_and_dtypes(aot_env):
    fn, x, y = _toy()
    pa = aot_cache._blob_path("tag1|cfg", (x, y))
    pb = aot_cache._blob_path("tag2|cfg", (x, y))
    pc = aot_cache._blob_path("tag1|cfg", (x.astype(jnp.bfloat16), y))
    assert len({pa, pb, pc}) == 3
    assert os.path.dirname(pa) == str(aot_env)


def test_disabled_returns_jit_unchanged(monkeypatch):
    monkeypatch.setenv("FCSR_AOT_CACHE", "0")
    fn, _, _ = _toy()
    assert aot_cache.wrap("toy|d", fn) is fn


def test_default_off_on_cpu_backend(monkeypatch):
    monkeypatch.delenv("FCSR_AOT_CACHE", raising=False)
    assert jax.default_backend() == "cpu"
    assert not aot_cache.enabled()


def test_gat_chunk_path_uses_wrapper_when_enabled(aot_env, monkeypatch):
    """The production GAT fold-parallel trainer routes its chunk program
    through the AOT wrapper and still reproduces the plain-jit
    trajectory exactly."""
    from fcsr_tpu.train.gat_loop import (GATTrainConfig,
                                         train_gat_folds_parallel)
    from tests.conftest import random_symmetric

    rng = np.random.default_rng(0)
    lr_all = np.stack([random_symmetric(rng, 20) for _ in range(6)])
    hr_all = np.stack([random_symmetric(rng, 28) for _ in range(6)])
    cfg = GATTrainConfig(epochs=4, dim=4, ks=(0.5,), heads=2,
                         n_nodes=20, m_nodes=28, drop_p=0.0)
    folds = [(np.arange(4), np.array([4, 5]))]

    monkeypatch.setenv("FCSR_AOT_CACHE", "0")
    _, best_off, hists_off = train_gat_folds_parallel(
        cfg, lr_all, hr_all, folds, seed=1)

    monkeypatch.setenv("FCSR_AOT_CACHE", "1")
    _, best_on, hists_on = train_gat_folds_parallel(
        cfg, lr_all, hr_all, folds, seed=1)

    assert list(aot_env.iterdir()), "chunk blob was not written"
    assert hists_on[0]["val"] == hists_off[0]["val"]
    fa = jax.flatten_util.ravel_pytree(best_on[0]["params"])[0]
    fb = jax.flatten_util.ravel_pytree(best_off[0]["params"])[0]
    np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))
