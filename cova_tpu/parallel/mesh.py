"""Device mesh + sharding layout for data/tensor-parallel training.

The reference is strictly single-device (``/root/reference/main.py:17`` picks
one ``cuda:<d>`` or CPU; no ``torch.distributed`` anywhere). Scale-out here is
native: a (data, model) ``jax.sharding.Mesh``; batches are sharded on ``data``
across ICI, parameters are replicated except the wide decoder/GAT kernels,
which can be tensor-sharded on ``model``. Everything runs under one ``jit`` —
XLA inserts the psum/all-gather collectives (gradient reduction, cross-replica
masked-BN statistics) from the sharding layout; there are no hand-written
communication calls to port.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None, n_model: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    n = n_data * n_model
    assert n <= len(devices), (n, len(devices))
    grid = mesh_utils.create_device_mesh(
        (n_data, n_model), devices=devices[:n]
    )
    return Mesh(grid, ("data", "model"))


def mesh_from_config(cfg) -> Optional[Mesh]:
    """Build the (data, model) mesh `cova train` runs on, or None for the
    plain single-device path.

    ``cfg.num_devices``: 0 = all available, 1 = single device (no mesh),
    N > 1 = exactly N. ``cfg.model_parallel`` splits those devices into a
    tensor-parallel axis for the wide decoder/GAT kernels. The global batch
    must divide evenly over the data axis — the train step's CE-*sum* loss
    (reference ``main.py:139``) makes the batch dimension semantic, so
    silently resizing it would change the gradient scale.
    """
    n = cfg.num_devices
    if n == 0:
        n = len(jax.devices())
    if n <= 1:
        return None
    if n > len(jax.devices()):
        raise ValueError(
            f"num_devices={n} but only {len(jax.devices())} devices are "
            "visible"
        )
    n_model = max(1, cfg.model_parallel)
    if n % n_model != 0:
        raise ValueError(
            f"num_devices={n} not divisible by model_parallel={n_model}"
        )
    n_data = n // n_model
    if cfg.batch_size % n_data != 0:
        raise ValueError(
            f"batch_size={cfg.batch_size} must be divisible by the data-"
            f"parallel degree {n_data} (num_devices={n} / "
            f"model_parallel={n_model})"
        )
    return make_mesh(n_data=n_data, n_model=n_model)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def eval_batch_sharding(mesh: Mesh, eval_batch_size: int) -> NamedSharding:
    """Eval batches always shard over the data axis: ``run_eval`` pads each
    eval batch up to the next data-degree multiple (masked pages are free),
    so the reference-fixed eval bs=10 (``datasets.py:241,252``) shards on
    every mesh. The pre-round-5 behavior replicated the whole batch on any
    non-divisor mesh — correct, but on dp=8 every chip redid the full eval
    forward; padding 10->16 runs 2 pages per chip instead."""
    del eval_batch_size  # kept for call-site compatibility
    return batch_sharding(mesh)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Param tree paths whose *last* axis is tensor-sharded over the model axis
# when the mesh has one. These are the wide matmuls (decoder 992x992, GAT
# projections 608x384); everything else is replicated.
_MODEL_SHARDED_SUFFIXES = (
    ("decoder_hidden", "Dense_0", "kernel"),
    ("gat", "W_i", "kernel"),
    ("gat", "W_j", "kernel"),
)


def _path_names(path) -> tuple:
    names = []
    for k in path:
        names.append(getattr(k, "key", getattr(k, "name", str(k))))
    return tuple(names)


def param_shardings(params: Any, mesh: Mesh):
    """Sharding tree for the params pytree."""
    use_model = mesh.shape.get("model", 1) > 1

    def rule(path, leaf):
        names = _path_names(path)
        if use_model and leaf.ndim >= 2:
            for suffix in _MODEL_SHARDED_SUFFIXES:
                if names[-len(suffix):] == suffix:
                    spec = [None] * (leaf.ndim - 1) + ["model"]
                    return NamedSharding(mesh, P(*spec))
        return replicated(mesh)

    return jax.tree_util.tree_map_with_path(rule, params)


def state_shardings(state: Any, mesh: Mesh):
    """Sharding tree for a full TrainState: params + their optimizer moments
    share the param layout; scalars/stats replicate."""
    pshard = param_shardings(state.params, mesh)

    def like_params(tree):
        # Adam moments mirror param shapes; reuse the param rule by path.
        return param_shardings(tree, mesh)

    import optax  # local import to avoid cycle at module load

    def map_opt(entry):
        if isinstance(entry, optax.ScaleByAdamState):
            return entry._replace(
                count=replicated(mesh),
                mu=like_params(entry.mu),
                nu=like_params(entry.nu),
            )
        return jax.tree.map(lambda _: replicated(mesh), entry)

    opt_shard = tuple(map_opt(e) for e in state.opt_state)
    return state.replace(
        step=replicated(mesh),
        params=pshard,
        batch_stats=jax.tree.map(lambda _: replicated(mesh), state.batch_stats),
        opt_state=opt_shard,
    )


def shard_train_state(state, mesh: Mesh):
    """Place a TrainState onto the mesh per ``state_shardings``.

    Multi-process: every host holds the identical full state (same init
    seed / same restored checkpoint), so each leaf is placed with
    ``make_array_from_process_local_data(global_shape == local.shape)`` —
    each process carves out its addressable shards; ``jax.device_put``
    cannot place onto non-addressable devices.
    """
    shardings = state_shardings(state, mesh)
    if jax.process_count() == 1:
        return jax.device_put(state, shardings)

    def place(x, sh):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sh, x, x.shape)

    return jax.tree.map(place, state, shardings)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch onto the mesh, batch-dim sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(np.asarray(x), sh), batch)
