"""init_distributed argument paths and failure loudness.

These tests pin the wrapper's CONTRACT by faking
jax.distributed.initialize: explicit args propagate, num_processes=1 is a
no-op, partial args are rejected, and a failed auto-detect under cluster
launch env vars warns loudly (or raises with strict=True) instead of
silently degrading to a 1/Nth sweep (VERDICT r2 weak #4).

The REAL multi-process path (actual OS processes + a localhost
coordinator + a concurrent query-sharded sweep) is integration-tested in
tests/test_multiprocess.py.
"""

import warnings

import pytest

import jax

from piccolo_tpu.parallel.sharding import init_distributed


@pytest.fixture
def fake_init(monkeypatch):
    calls = []

    def initialize(**kw):
        calls.append(kw)

    monkeypatch.setattr(jax.distributed, "initialize", initialize)
    return calls


def test_explicit_cluster_args_propagate(fake_init):
    idx = init_distributed("10.0.0.1:1234", 4, 2)
    assert idx == jax.process_index()
    assert fake_init == [dict(
        coordinator_address="10.0.0.1:1234", num_processes=4, process_id=2
    )]


def test_single_process_noop(fake_init):
    assert init_distributed(num_processes=1) == 0
    assert fake_init == []


def test_coordinator_only_is_forwarded(fake_init):
    """coordinator_address alone is a JAX-supported pod launch (the pod
    environment infers num_processes/process_id) — it must be forwarded,
    not rejected (review r3 #4)."""
    init_distributed("10.0.0.1:1234")
    assert fake_init == [dict(
        coordinator_address="10.0.0.1:1234", num_processes=None,
        process_id=None,
    )]


def test_partial_args_rejected(fake_init):
    with pytest.raises(ValueError, match="process_id without"):
        init_distributed(process_id=0)
    with pytest.raises(ValueError, match="coordinator_address"):
        init_distributed(num_processes=4)
    assert fake_init == []


def test_auto_detect_failure_is_silent_without_cluster_env(monkeypatch):
    def boom(**kw):
        raise RuntimeError("no cluster detected")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    for var in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
                "SLURM_STEP_NODELIST"):
        monkeypatch.delenv(var, raising=False)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any warning -> failure
        assert init_distributed() == jax.process_index()


def test_auto_detect_failure_warns_loudly_with_cluster_env(
    monkeypatch, capsys
):
    def boom(**kw):
        raise RuntimeError("coordinator unreachable")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    monkeypatch.setenv("COORDINATOR_ADDRESS", "10.0.0.1:1234")
    with pytest.warns(RuntimeWarning, match="1/Nth"):
        init_distributed()
    assert "COORDINATOR_ADDRESS" in capsys.readouterr().err

    # strict: the misconfiguration is fatal
    with pytest.raises(RuntimeError, match="coordinator unreachable"):
        init_distributed(strict=True)
