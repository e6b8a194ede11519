"""Tests for utility subsystems: transfer staging, loggers, debug
contexts, profiling, distributed helpers."""

import json
import os

import jax
import numpy as np
import pytest

from fcsr_tpu.utils import PhaseTimer, set_seed
from fcsr_tpu.utils.debug import eager_debug, nan_debug
from fcsr_tpu.utils.logging import MetricLogger
from fcsr_tpu.utils.transfer import device_put_fast, to_host


def test_device_put_fast_roundtrip(rng):
    for shape in [(7,), (5, 6), (3, 4, 5)]:
        x = rng.random(shape).astype(np.float32)
        d = device_put_fast(x)
        assert d.shape == x.shape
        np.testing.assert_array_equal(to_host(d), x)


def test_persistent_compile_cache(tmp_path, monkeypatch):
    """enable_persistent_cache points jax at an on-disk cache (works on
    the CPU backend too), is idempotent, and honors the kill switch."""
    import fcsr_tpu.utils.compile_cache as cc

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_flag, prev_cc_dir = cc._ENABLED, cc._DIR
    cache = str(tmp_path / "cache")
    try:
        cc._ENABLED = False
        monkeypatch.setenv("FCSR_NO_COMPILE_CACHE", "1")
        assert cc.enable_persistent_cache(cache) is None

        monkeypatch.delenv("FCSR_NO_COMPILE_CACHE")
        # conftest already enabled a session-wide cache; switching to a
        # fresh dir must take effect for the NEXT compile (jax's live
        # cache object is reset on dir change).
        cc._ENABLED = prev_flag
        assert cc.enable_persistent_cache(cache) == cache
        assert cc.enable_persistent_cache(cache) == cache  # idempotent
        x = jax.jit(lambda v: v * 2 + 1)(np.arange(4, dtype=np.float32))
        np.testing.assert_array_equal(np.asarray(x), [1, 3, 5, 7])
        assert os.path.isdir(cache) and len(os.listdir(cache)) >= 1
    finally:
        cc._ENABLED, cc._DIR = False, None
        if prev_flag and prev_cc_dir:  # re-point at the session cache
            cc.enable_persistent_cache(prev_cc_dir)
        else:
            jax.config.update("jax_compilation_cache_dir", prev_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", prev_min)


def test_metric_logger(tmp_path):
    path = str(tmp_path / "log.jsonl")
    log = MetricLogger(path)
    log.log("epoch", loss=1.5, epoch=0)
    log.log("epoch", loss=np.float32(1.2), epoch=1)
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2
    assert lines[1]["loss"] == pytest.approx(1.2)
    assert lines[0]["event"] == "epoch"


def test_nan_debug_raises():
    import jax.numpy as jnp
    with nan_debug():
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)).block_until_ready()
    # flag restored
    assert not jax.config.jax_debug_nans


def test_eager_debug_scopes():
    with eager_debug():
        assert jax.config.jax_disable_jit
    assert not jax.config.jax_disable_jit


def test_phase_timer():
    t = PhaseTimer()
    with t("a"):
        pass
    with t("a"):
        pass
    r = t.report()
    assert "a" in r and r["a"] >= 0


def test_set_seed_returns_key():
    key = set_seed(7)
    assert key.shape == (2,) or key.dtype  # a valid PRNG key
    # host RNGs are seeded deterministically
    import random
    set_seed(7)
    a = random.random()
    set_seed(7)
    assert random.random() == a


def test_host_shard_slice_single_host():
    from fcsr_tpu.parallel.distributed import (host_shard_slice,
                                               maybe_initialize_distributed)
    assert maybe_initialize_distributed() is False
    s = host_shard_slice(10)
    assert (s.stop - s.start) == 10  # single process gets everything


def test_optax_inject_hyperparams_replace_contract():
    """The plateau-decay path rebuilds InjectHyperparamsState functionally
    (opt_state._replace(hyperparams={...})). Pin the optax contract this
    relies on: the state is a NamedTuple whose replaced learning_rate is
    what subsequent updates consume (ADVICE r2: no in-place dict
    mutation)."""
    import optax

    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=1.0)
    p = np.ones(3, np.float32)
    s = tx.init(p)
    assert hasattr(s, "_replace") and "learning_rate" in s.hyperparams
    s = s._replace(hyperparams={**s.hyperparams,
                                "learning_rate": np.float32(0.25)})
    g = np.ones(3, np.float32)
    upd, _ = tx.update(g, s, p)
    np.testing.assert_allclose(np.asarray(upd), -0.25 * g, atol=1e-7)


def test_mosaic_mm_modes():
    """All FCSR_MM_MODE formulations agree with the f32 product at their
    documented accuracy class, and the custom_vjp adjoints are the ideal
    transposed products in the SAME mode."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fcsr_tpu.core import mosaic_mm as M

    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.normal(size=(24, 40)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(40, 16)).astype(np.float32))
    want = np.asarray(a) @ np.asarray(b)

    # compensated modes: O(eps_bf16^2) ~ 1e-4 relative class
    for fn in (M.mm_bf16x3, M.mm_bf16x3_concat):
        np.testing.assert_allclose(np.asarray(fn(a, b)), want,
                                   rtol=5e-4, atol=5e-4)
    # single-pass bf16: operand-rounding class (~1e-2 relative)
    np.testing.assert_allclose(np.asarray(M.mm_bf16(a, b)), want,
                               rtol=0.05, atol=0.15)

    # pinned variants: same accuracy class + ideal adjoints
    for fn in (M.mm_compensated, M.mm_compensated3):
        np.testing.assert_allclose(np.asarray(fn(a, b)), want,
                                   rtol=5e-4, atol=5e-4)
        val, vjp = jax.vjp(fn, a, b)
        da, db = vjp(jnp.ones_like(val))
        np.testing.assert_allclose(np.asarray(da),
                                   np.asarray(fn(jnp.ones_like(val), b.T)))
        np.testing.assert_allclose(np.asarray(db),
                                   np.asarray(fn(a.T, jnp.ones_like(val))))

    old = M.MODE
    try:
        for mode in ("bf16x3_concat", "bf16x3", "bf16"):
            M.MODE = mode
            val, vjp = jax.vjp(M.mm, a, b)
            ct = jnp.ones_like(val)
            da, db = vjp(ct)
            np.testing.assert_allclose(np.asarray(val),
                                       np.asarray(M._impl(a, b)))
            np.testing.assert_allclose(np.asarray(da),
                                       np.asarray(M._impl(ct, b.T)))
            np.testing.assert_allclose(np.asarray(db),
                                       np.asarray(M._impl(a.T, ct)))
    finally:
        M.MODE = old


def test_stage_cached_memoizes_by_content(rng):
    """stage_cached returns THE SAME device array for equal content
    (no re-transfer), a different one for different content, and the
    staged values round-trip exactly."""
    from fcsr_tpu.utils import transfer

    a = rng.normal(size=(4, 6)).astype(np.float32)
    d1 = transfer.stage_cached(a)
    d2 = transfer.stage_cached(a.copy())       # equal content -> cache hit
    assert d1 is d2
    np.testing.assert_array_equal(np.asarray(d1), a)
    b = a + 1.0
    d3 = transfer.stage_cached(b)
    assert d3 is not d1
    np.testing.assert_array_equal(np.asarray(d3), b)


def test_device_put_tree_fast_roundtrip(rng):
    """One-flat-buffer-per-dtype tree staging reproduces every leaf
    (mixed shapes AND dtypes; cached unpack program reused on a second
    same-structured tree)."""
    import jax

    from fcsr_tpu.utils.transfer import device_put_tree_fast

    def make_tree(seed):
        r = np.random.default_rng(seed)
        return {
            "params": {"a": r.normal(size=(3, 4, 5)).astype(np.float32),
                       "b": r.normal(size=(7,)).astype(np.float32)},
            "count": np.asarray(r.integers(0, 9, size=(2, 2)), np.int32),
            "scalar": np.float32(r.normal()),
        }

    for seed in (0, 1):  # second pass exercises the unpack-program cache
        t = make_tree(seed)
        d = device_put_tree_fast(t)
        flat_t = jax.tree_util.tree_leaves_with_path(t)
        flat_d = jax.tree_util.tree_leaves_with_path(d)
        assert [p for p, _ in flat_t] == [p for p, _ in flat_d]
        for (_, a), (_, b) in zip(flat_t, flat_d):
            assert np.asarray(b).dtype == np.asarray(a).dtype
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
