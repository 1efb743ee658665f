"""Multi-host (pod-scale) initialization and input sharding.

The reference has no distributed layer at all (SURVEY.md §2); this module is
the framework's multi-host entry. On a TPU pod slice each host runs the same
program; ``initialize()`` wires ``jax.distributed`` (controller discovery is
automatic on TPU), after which:

  * ``jax.devices()`` is the global device list, ``jax.local_devices()``
    this host's chips;
  * the (data, model) mesh from ``mesh.make_mesh`` spans the pod, and the
    same jit-ted train step runs SPMD — gradient psums ride ICI within a
    slice and DCN across slices, inserted by XLA from the shardings;
  * each host feeds only its stripe of every batch: ``host_shard_args``
    gives the (shard_index, shard_count) pair for ``DataPipeline``, and
    ``local_batch_to_global`` assembles a globally-sharded array from
    per-host data via ``jax.make_array_from_process_local_data``.

This is wired into the product: ``cli.main`` calls ``initialize()`` before
anything touches the backend, ``make_pipelines`` stripes the train pipeline
with ``host_shard_args()``, and the trainer routes batches through
``local_batch_to_global`` / ``full_batch_to_global``. Single-process runs
are no-ops throughout, so the same code path serves one chip and a pod.

Manual launchers (e.g. multi-process CPU, ``tests/test_multiprocess.py``)
set ``COVA_COORDINATOR_ADDRESS`` + ``COVA_NUM_PROCESSES`` +
``COVA_PROCESS_ID``; TPU pod slices need none of them (auto-discovery).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np

_initialized = False

# Environment markers that identify a multi-host launch. Querying the
# backend (jax.process_count()) is NOT an option here: it would initialize
# the backend, after which jax.distributed.initialize() is too late — and
# pre-init it always answers 1 anyway.
_MULTIHOST_ENV_VARS = (
    "COVA_COORDINATOR_ADDRESS",
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "TPU_WORKER_HOSTNAMES",  # multi-host TPU slice (GCE metadata-injected)
)


def _looks_multihost() -> bool:
    for v in _MULTIHOST_ENV_VARS:
        val = os.environ.get(v)
        if not val:
            continue
        if v == "TPU_WORKER_HOSTNAMES" and "," not in val:
            # A single-entry worker list is a one-host slice (tunnel/dev
            # setups export it too) — argless initialize would hang waiting
            # for a coordinator that never forms.
            continue
        return True
    return False


def _env_int(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v else None


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Wire ``jax.distributed`` for a multi-host run.

    MUST be called before anything touches the JAX backend — including
    ``jax.devices()`` / ``jax.process_count()``, which initialize it as a
    side effect. Call order, not discovery, is the whole contract here.

    * explicit coordinator args -> ``jax.distributed.initialize(...)`` with
      them (manual launchers);
    * no args but ``COVA_COORDINATOR_ADDRESS`` set -> coordinator/count/id
      from ``COVA_{COORDINATOR_ADDRESS,NUM_PROCESSES,PROCESS_ID}`` — the
      manual-launcher env contract (multi-process CPU, custom schedulers;
      count/id may be omitted where the platform can discover them);
    * no args but a multi-host environment (other coordinator env var or a
      TPU pod slice) -> argless ``jax.distributed.initialize()``, which
      auto-discovers the topology — on multi-host TPU this call is
      REQUIRED, or every host sees only its local chips;
    * single-process run -> no-op, so one code path serves laptop and pod.

    Idempotent: repeat calls return immediately.
    """
    global _initialized
    if _initialized:
        return
    if coordinator_address is None:
        coordinator_address = os.environ.get("COVA_COORDINATOR_ADDRESS")
        if coordinator_address:
            if num_processes is None:
                num_processes = _env_int("COVA_NUM_PROCESSES")
            if process_id is None:
                process_id = _env_int("COVA_PROCESS_ID")
        else:
            coordinator_address = None
    # Coordinator connect deadline (seconds), honored on BOTH branches.
    # JAX's default is 300 s, which a loaded single-core host can blow
    # through while another job owns the core (observed: 2-process CPU
    # test flaked while a TPU battery compiled next door).
    # COVA_DIST_INIT_TIMEOUT widens it without touching the normal-path
    # default.
    kwargs = {}
    timeout = _env_int("COVA_DIST_INIT_TIMEOUT")
    if timeout is not None:
        kwargs["initialization_timeout"] = timeout
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
        _initialized = True
    elif _looks_multihost():
        jax.distributed.initialize(**kwargs)
        _initialized = True


def is_multiprocess() -> bool:
    """True when this run spans more than one host process."""
    return jax.process_count() > 1


def host_shard_args() -> Tuple[int, int]:
    """(shard_index, shard_count) for DataPipeline: each host reads a
    disjoint stripe of every epoch's page order."""
    return jax.process_index(), jax.process_count()


def local_batch_to_global(local_batch, sharding):
    """Assemble a globally-sharded Batch from this host's local stripe.

    local_batch leaves have the per-host batch dim; the returned arrays have
    the global batch dim (local * process_count), sharded over the mesh's
    data axis. The per-host stripe order (``DataPipeline._shard_order``)
    lines hosts up so the global batch is the same page SET the
    single-process run would form.
    """

    def assemble(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape
        )

    return jax.tree.map(assemble, local_batch)


def full_batch_to_global(batch, sharding):
    """Place a batch that EVERY host holds identically (eval: val/test reads
    are unsharded and deterministic) onto the global mesh.

    ``global_shape == local.shape`` tells
    ``jax.make_array_from_process_local_data`` the local array IS the global
    one; each process slices out its addressable shards, so this serves both
    replicated and data-sharded eval layouts.
    """

    def place(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x, x.shape)

    return jax.tree.map(place, batch)
