"""Checkpoint round-trips: best/last tags, optimizer state, bookkeeping."""

import jax
import jax.numpy as jnp
import numpy as np

from cova_tpu.utils.checkpoint import (
    CheckpointManager,
    default_extra,
    restore_train_state,
    save_train_state,
)


def _tiny_state(seed=0):
    from cova_tpu.config import Config
    from cova_tpu.data.batching import Batch
    from cova_tpu.models.cova import build_model
    from cova_tpu.train.steps import create_train_state

    cfg = Config(
        img_height=16, max_boxes=8, context_size=1, hidden_dim=8,
        bbox_hidden_dim=4, compute_dtype="float32",
    )
    rng = np.random.default_rng(seed)
    P, K = cfg.pad_boxes, cfg.n_context
    batch = Batch(
        images=rng.integers(0, 255, (1, 16, 16, 3), dtype=np.uint8),
        boxes=np.abs(rng.normal(2, 1, (1, P, 4))).astype(np.float32),
        labels=np.zeros((1, P), np.int32),
        box_mask=np.ones((1, P), bool),
        context_indices=np.full((1, P, K), -1, np.int32),
        additional_feats=np.zeros((1, P, 0), np.float32),
    )
    model = build_model(cfg)
    return create_train_state(model, cfg, batch, jax.random.PRNGKey(seed))


def test_roundtrip_params_and_opt_state(tmp_path):
    state = _tiny_state()
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    extra = {
        "epoch": np.int32(7),
        "best_eval_acc": np.float64(83.25),
        "patience": np.int32(2),
    }
    save_train_state(mgr, "best", state, extra)
    assert mgr.exists("best") and not mgr.exists("last")

    fresh = _tiny_state(seed=1)  # different init
    restored, extra_r = restore_train_state(mgr, "best", fresh)
    for a, b in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(restored.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(state.opt_state), jax.tree.leaves(restored.opt_state)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(extra_r["epoch"]) == 7
    assert float(extra_r["best_eval_acc"]) == 83.25
    assert int(extra_r["patience"]) == 2


def test_restored_state_is_trainable(tmp_path):
    """A restored state must keep optimizer momentum (true resume; the
    reference loses it, train.py:84)."""
    state = _tiny_state()
    mgr = CheckpointManager(str(tmp_path / "c2"))
    save_train_state(mgr, "last", state, default_extra())
    restored, _ = restore_train_state(mgr, "last", _tiny_state(seed=2))
    # optax state types preserved (not lists of raw arrays)
    import optax

    assert any(
        isinstance(e, optax.ScaleByAdamState) for e in restored.opt_state
    )
