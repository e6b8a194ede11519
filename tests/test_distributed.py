"""Tests for the multi-host bootstrap helpers (parallel/distributed.py).

jax.distributed.initialize is monkeypatched — a real coordinator needs
multi-host hardware; what these tests pin down is the decision logic
(env/arg precedence) and the host-shard arithmetic, including n % hosts != 0.
"""

import numpy as np
import pytest

from fcsr_tpu.parallel.distributed import (host_shard_slice,
                                           maybe_initialize_distributed)


@pytest.fixture
def fake_init(monkeypatch):
    calls = []

    def record(**kwargs):
        calls.append(kwargs)

    import jax
    monkeypatch.setattr(jax.distributed, "initialize", record)
    for var in ("FCSR_COORDINATOR", "FCSR_NUM_PROCESSES",
                "FCSR_PROCESS_ID", "FCSR_DISTRIBUTED"):
        monkeypatch.delenv(var, raising=False)
    return calls


def test_noop_single_host(fake_init):
    assert maybe_initialize_distributed() is False
    assert fake_init == []


def test_explicit_args(fake_init):
    assert maybe_initialize_distributed("10.0.0.1:1234", 4, 2) is True
    assert fake_init == [{"coordinator_address": "10.0.0.1:1234",
                          "num_processes": 4, "process_id": 2}]


def test_env_fallbacks(fake_init, monkeypatch):
    monkeypatch.setenv("FCSR_COORDINATOR", "host0:9999")
    monkeypatch.setenv("FCSR_NUM_PROCESSES", "8")
    monkeypatch.setenv("FCSR_PROCESS_ID", "3")
    assert maybe_initialize_distributed() is True
    assert fake_init == [{"coordinator_address": "host0:9999",
                          "num_processes": 8, "process_id": 3}]


def test_env_process_id_defaults_to_zero(fake_init, monkeypatch):
    monkeypatch.setenv("FCSR_COORDINATOR", "host0:9999")
    monkeypatch.setenv("FCSR_NUM_PROCESSES", "2")
    assert maybe_initialize_distributed() is True
    assert fake_init[0]["process_id"] == 0


def test_pod_autodetect_env(fake_init, monkeypatch):
    monkeypatch.setenv("FCSR_DISTRIBUTED", "1")
    assert maybe_initialize_distributed() is True
    assert fake_init == [{}]


def test_coordinator_without_nprocs_is_noop(fake_init, monkeypatch):
    monkeypatch.setenv("FCSR_COORDINATOR", "host0:9999")
    assert maybe_initialize_distributed() is False
    assert fake_init == []


@pytest.mark.parametrize("n,count", [(10, 4), (8, 4), (3, 4), (0, 4),
                                     (167, 8), (1, 1)])
def test_host_shard_slice_partition(monkeypatch, n, count):
    """Slices across all hosts must tile [0, n) exactly, in order, with
    sizes differing by at most the ceil-division remainder."""
    import jax
    monkeypatch.setattr(jax, "process_count", lambda: count)
    got = []
    for pid in range(count):
        monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
        s = host_shard_slice(n)
        got.extend(range(n)[s])
        assert (s.stop - s.start) <= -(-n // count)
    assert got == list(range(n))


def test_host_shard_slice_single_host(monkeypatch):
    import jax
    monkeypatch.setattr(jax, "process_count", lambda: 1)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    assert host_shard_slice(167) == slice(0, 167)


def test_host_shard_slice_usable_on_arrays(monkeypatch):
    import jax
    monkeypatch.setattr(jax, "process_count", lambda: 3)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    x = np.arange(10)
    np.testing.assert_array_equal(x[host_shard_slice(10)], [4, 5, 6, 7])
