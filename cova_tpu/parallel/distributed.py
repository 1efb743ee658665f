"""Multi-host (pod-scale) initialization and input sharding glue.

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

Single-process runs are no-ops throughout, so the same code path serves one
chip and a pod.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed when running multi-host. Safe to call
    unconditionally; a single-process run returns immediately."""
    if jax.process_count() > 1:
        return  # already initialized by the launcher
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        jax.distributed.initialize(**kwargs)
    # On TPU pods with no explicit coordinator, the runtime injects the
    # topology; jax.distributed.initialize() with no args would also work
    # but is unnecessary for single-host runs.


def host_shard_args() -> Tuple[int, int]:
    """(shard_index, shard_count) for DataPipeline: each host reads a
    disjoint stripe of every epoch's page order."""
    return jax.process_index(), jax.process_count()


def local_batch_to_global(local_batch, mesh, sharding):
    """Assemble a globally-sharded Batch from this host's local stripe.

    local_batch leaves have the per-host batch dim; the returned arrays have
    the global batch dim, sharded over the mesh's data axis.
    """

    def assemble(x):
        global_shape = (
            x.shape[0] * jax.process_count(),
        ) + tuple(x.shape[1:])
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape
        )

    return jax.tree.map(assemble, local_batch)
