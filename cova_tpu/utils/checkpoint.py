"""Checkpointing with orbax: best-model save + full resume.

The reference saves only the model ``state_dict`` on the best val score and
cannot resume mid-training (``/root/reference/train.py:84,93-95``; optimizer
state is lost). Here a checkpoint carries params, batch stats, optimizer
state, epoch counter, and the best-val bookkeeping, so training survives
preemption — while keeping the reference's "best checkpoint wins" selection
rule.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _fetch(x: Any) -> np.ndarray:
    """Host copy of a leaf. Multi-host arrays sharded over non-addressable
    devices (tensor-parallel params on a pod) are resharded to replicated
    first — np.asarray can read a fully-replicated global array but not a
    partially-addressable one."""
    if (
        isinstance(x, jax.Array)
        and not x.is_fully_addressable
        and not x.is_fully_replicated
    ):
        from jax.sharding import NamedSharding, PartitionSpec

        repl = NamedSharding(x.sharding.mesh, PartitionSpec())
        x = jax.jit(lambda a: a, out_shardings=repl)(x)
    return np.asarray(x)


def _to_saveable(tree: Any) -> Any:
    return jax.tree.map(_fetch, tree)


class CheckpointManager:
    """Tiny wrapper over orbax: one 'best' checkpoint + one 'last' (resume)."""

    def __init__(self, directory: str):
        self.dir = os.path.abspath(directory)
        os.makedirs(self.dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, tag: str) -> str:
        return os.path.join(self.dir, tag)

    def save(self, tag: str, tree: Any):
        path = self._path(tag)
        self._ckptr.save(path, _to_saveable(tree), force=True)
        self._ckptr.wait_until_finished()

    def restore(self, tag: str, target: Optional[Any] = None) -> Any:
        path = self._path(tag)
        if target is not None:
            # _fetch, not np.asarray: a multi-host tensor-sharded target
            # (pod run with --model_parallel) has partially-addressable
            # leaves that np.asarray cannot read (same guard as save).
            target = jax.tree.map(_fetch, target)
        return self._ckptr.restore(path, target)

    def exists(self, tag: str) -> bool:
        return os.path.isdir(self._path(tag))


def save_train_state(mgr: CheckpointManager, tag: str, state, extra: dict):
    tree = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "extra": extra,
    }
    mgr.save(tag, tree)


def default_extra() -> dict:
    """Structure of the bookkeeping blob saved next to every train state."""
    return {
        "epoch": np.zeros((), np.int32),
        "best_eval_acc": np.zeros((), np.float64),
        "patience": np.zeros((), np.int32),
    }


def restore_train_state(
    mgr: CheckpointManager, tag: str, state, extra_target: Optional[dict] = None
):
    target = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "extra": extra_target if extra_target is not None else default_extra(),
    }
    tree = mgr.restore(tag, target)
    new_state = state.replace(
        step=tree["step"],
        params=tree["params"],
        batch_stats=tree["batch_stats"],
        opt_state=tree["opt_state"],
    )
    return new_state, tree["extra"]
