"""Unit tests for parallel/multihost.py (VERDICT r2 weak #7).

jax.process_count()/process_index() are 1/0 in any single-process run, so the
pure helpers are tested both at their real values and with monkeypatched
process topology; initialize() arg plumbing is tested with a mocked
jax.distributed.initialize (the real call needs a coordinator).
"""

import jax
import pytest

from lip2speech_tpu.parallel import multihost


def test_process_shard_single_process():
    assert multihost.process_shard(10) == slice(0, 10)
    assert multihost.process_shard(0) == slice(0, 0)


def test_host_local_batch_size_single_process():
    assert multihost.host_local_batch_size(8) == 8


def _patch_topology(monkeypatch, count, index):
    monkeypatch.setattr(jax, "process_count", lambda: count)
    monkeypatch.setattr(jax, "process_index", lambda: index)


def test_process_shard_multi_process(monkeypatch):
    # 10 items over 4 hosts: ceil(10/4)=3 per host, last host gets 1
    shards = []
    for rank in range(4):
        _patch_topology(monkeypatch, 4, rank)
        shards.append(multihost.process_shard(10))
    assert shards == [slice(0, 3), slice(3, 6), slice(6, 9), slice(9, 10)]
    # shards tile the dataset exactly: disjoint and complete
    covered = [i for s in shards for i in range(s.start, s.stop)]
    assert covered == list(range(10))


def test_process_shard_more_hosts_than_items(monkeypatch):
    _patch_topology(monkeypatch, 8, 7)
    s = multihost.process_shard(3)
    assert s.start >= s.stop or s.stop <= 3  # empty tail shard, never OOB


def test_host_local_batch_size_multi(monkeypatch):
    _patch_topology(monkeypatch, 4, 1)
    assert multihost.host_local_batch_size(32) == 8
    with pytest.raises(ValueError, match="not divisible"):
        multihost.host_local_batch_size(30)


def test_initialize_env_plumbing(monkeypatch):
    calls = {}

    def fake_init(**kw):
        calls.update(kw or {"auto": True})

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    monkeypatch.setenv("COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("NUM_PROCESSES", "4")
    monkeypatch.setenv("PROCESS_ID", "2")
    info = multihost.initialize()
    assert calls == {"coordinator_address": "10.0.0.1:1234",
                     "num_processes": 4, "process_id": 2}
    assert info["process_count"] == jax.process_count()
    assert info["global_devices"] == jax.device_count()


def test_initialize_explicit_args_override_env(monkeypatch):
    calls = {}
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.update(kw))
    monkeypatch.setenv("COORDINATOR_ADDRESS", "wrong:1")
    monkeypatch.setenv("NUM_PROCESSES", "16")
    multihost.initialize(coordinator_address="host:2", num_processes=2,
                         process_id=1)
    assert calls == {"coordinator_address": "host:2",
                     "num_processes": 2, "process_id": 1}


def test_initialize_autodetect_when_no_env(monkeypatch):
    seen = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: seen.append(kw))
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    multihost.initialize()
    assert seen == [{}]  # cloud-TPU auto-detection path
