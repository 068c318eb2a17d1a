"""Tests for parallel/distributed.py (multi-host DCN setup helpers)."""

import numpy as np

from points2surf_tpu.parallel import distributed


def test_initialize_noop_single_process(monkeypatch):
    """Without coordinator env vars or a TPU pod, initialize must no-op."""
    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    assert distributed.initialize() is False


def test_initialize_detects_pod_env(monkeypatch):
    """A multi-worker TPU pod env triggers the initialize path."""
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1")
    calls = {}

    def fake_init(**kw):
        calls.update(kw)

    monkeypatch.setattr(
        distributed.jax.distributed, "initialize", fake_init
    )
    assert distributed.initialize() is True
    assert "coordinator_address" in calls


def test_shard_host_batch_partitions_evenly(monkeypatch):
    idx = np.arange(64)
    monkeypatch.setattr(distributed.jax, "process_count", lambda: 4)
    shards = []
    for pid in range(4):
        monkeypatch.setattr(distributed.jax, "process_index", lambda p=pid: p)
        shards.append(distributed.shard_host_batch(idx))
    # shards tile the global batch in order, equal sizes, no overlap
    assert all(len(s) == 16 for s in shards)
    np.testing.assert_array_equal(np.concatenate(shards), idx)


def test_shard_host_batch_drops_remainder(monkeypatch):
    """Non-divisible batches drop the tail (per-host shapes must match)."""
    idx = np.arange(10)
    monkeypatch.setattr(distributed.jax, "process_count", lambda: 4)
    total = 0
    for pid in range(4):
        monkeypatch.setattr(distributed.jax, "process_index", lambda p=pid: p)
        s = distributed.shard_host_batch(idx)
        assert len(s) == 2
        total += len(s)
    assert total == 8


def test_shard_host_batch_single_process(monkeypatch):
    monkeypatch.setattr(distributed.jax, "process_count", lambda: 1)
    monkeypatch.setattr(distributed.jax, "process_index", lambda: 0)
    idx = np.arange(7)
    np.testing.assert_array_equal(distributed.shard_host_batch(idx), idx)
