"""Contract tests for parallel.distributed.initialize.

VERDICT r1 item 4: the old implementation gated on jax.process_count(),
which initializes the backend (making jax.distributed.initialize() too late)
and always answers 1 pre-init. The contract now: never touch the backend,
call jax.distributed.initialize() exactly when the launch is multi-host.
"""

import pytest

from cova_tpu.parallel import distributed


@pytest.fixture(autouse=True)
def fresh(monkeypatch):
    monkeypatch.setattr(distributed, "_initialized", False)
    # Make any backend touch an error: initialize() must not query the
    # backend to decide what to do.
    monkeypatch.setattr(
        distributed.jax, "process_count",
        lambda: pytest.fail("initialize() must not touch the backend"),
    )
    for v in distributed._MULTIHOST_ENV_VARS:
        monkeypatch.delenv(v, raising=False)


def test_explicit_coordinator_calls_jax_distributed(monkeypatch):
    calls = []
    monkeypatch.setattr(
        distributed.jax.distributed, "initialize",
        lambda **kw: calls.append(kw),
    )
    distributed.initialize("host0:1234", num_processes=4, process_id=2)
    assert calls == [dict(
        coordinator_address="host0:1234", num_processes=4, process_id=2,
    )]


def test_cova_env_passes_explicit_args(monkeypatch):
    """The COVA_* env triple is the manual-launcher contract (multi-process
    CPU has no auto-discovery): it must reach jax.distributed.initialize as
    explicit arguments."""
    calls = []
    monkeypatch.setattr(
        distributed.jax.distributed, "initialize",
        lambda **kw: calls.append(kw),
    )
    monkeypatch.setenv("COVA_COORDINATOR_ADDRESS", "host0:1234")
    monkeypatch.setenv("COVA_NUM_PROCESSES", "2")
    monkeypatch.setenv("COVA_PROCESS_ID", "1")
    distributed.initialize()
    assert calls == [dict(
        coordinator_address="host0:1234", num_processes=2, process_id=1,
    )]


def test_platform_env_marker_triggers_argless_initialize(monkeypatch):
    """Platform markers (TPU pod metadata) -> argless auto-discovery."""
    calls = []
    monkeypatch.setattr(
        distributed.jax.distributed, "initialize",
        lambda **kw: calls.append(kw),
    )
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "w0,w1")
    distributed.initialize()
    assert calls == [{}]  # argless: jax auto-discovers the topology


def test_single_process_is_noop(monkeypatch):
    monkeypatch.setattr(
        distributed.jax.distributed, "initialize",
        lambda **kw: pytest.fail("must not initialize on single-process"),
    )
    distributed.initialize()


def test_idempotent(monkeypatch):
    calls = []
    monkeypatch.setattr(
        distributed.jax.distributed, "initialize",
        lambda **kw: calls.append(kw),
    )
    distributed.initialize("host0:1234", num_processes=2, process_id=0)
    distributed.initialize("host0:1234", num_processes=2, process_id=0)
    assert len(calls) == 1
