"""Multi-chip paths on the 8-device CPU mesh: dp/tp train step, collective
BN statistics, replicated-vs-sharded equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cova_tpu.data.batching import Batch
from cova_tpu.models.cova import build_model
from cova_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    shard_batch,
    state_shardings,
)
from cova_tpu.train.steps import create_train_state, train_step


def _batch(cfg, b, rng):
    P, K = cfg.pad_boxes, cfg.n_context
    imgs = rng.integers(0, 255, (b, cfg.img_height, cfg.img_height, 3),
                        dtype=np.uint8)
    boxes = rng.uniform(1, 40, (b, P, 4)).astype(np.float32)
    boxes[..., 2:] += boxes[..., :2]
    mask = np.zeros((b, P), bool)
    mask[:, :10] = True
    labels = np.zeros((b, P), np.int32)
    labels[:, :3] = [1, 2, 3]
    ctx = np.full((b, P, K), -1, np.int32)
    ctx[:, :10, :4] = rng.integers(0, 10, (b, 10, 4))
    return Batch(
        images=imgs, boxes=boxes, labels=labels, box_mask=mask,
        context_indices=ctx,
        additional_feats=np.zeros((b, P, 0), np.float32),
    )


@pytest.fixture(scope="module")
def small_cfg():
    from cova_tpu.config import Config

    return Config(
        img_height=32, max_boxes=16, context_size=2, hidden_dim=16,
        bbox_hidden_dim=8, batch_size=8, compute_dtype="float32",
    )


def test_dp_tp_train_step(small_cfg):
    assert len(jax.devices()) >= 8
    mesh = make_mesh(n_data=4, n_model=2)
    rng = np.random.default_rng(0)
    batch = _batch(small_cfg, 8, rng)
    model = build_model(small_cfg)
    state = create_train_state(
        model, small_cfg, batch, jax.random.PRNGKey(0)
    )
    shardings = state_shardings(state, mesh)
    state = jax.device_put(state, shardings)
    sharded = shard_batch(batch, mesh)
    with mesh:
        new_state, metrics = train_step(
            state, sharded, jax.random.PRNGKey(1)
        )
    assert np.isfinite(float(metrics["loss_sum"]))
    # tensor-sharded decoder kernel really is distributed over 'model'
    k = new_state.params["decoder_hidden"]["Dense_0"]["kernel"]
    assert "model" in str(k.sharding.spec)


def test_sharded_matches_single_device(small_cfg):
    """One dp step on the mesh must equal the same step on one device
    (masked-BN stats and gradient reduction are global either way)."""
    rng = np.random.default_rng(1)
    batch = _batch(small_cfg, 8, rng)
    model = build_model(small_cfg)

    state1 = create_train_state(
        model, small_cfg, batch, jax.random.PRNGKey(0)
    )
    new1, m1 = train_step(state1, batch, jax.random.PRNGKey(1))
    loss1 = float(m1["loss_sum"])

    mesh = make_mesh(n_data=8, n_model=1)
    state2 = create_train_state(
        model, small_cfg, batch, jax.random.PRNGKey(0)
    )
    state2 = jax.device_put(state2, state_shardings(state2, mesh))
    sharded = shard_batch(batch, mesh)
    with mesh:
        new2, m2 = train_step(state2, sharded, jax.random.PRNGKey(1))
    loss2 = float(m2["loss_sum"])
    np.testing.assert_allclose(loss1, loss2, rtol=1e-5)

    # Updated params agree up to f32 reduction-order noise amplified by
    # Adam: for a near-zero gradient whose sign flips under a different
    # summation order, the first-step update swings by up to
    # lr * b1 / sqrt(b2) ~ 1.6e-3. A missing gradient psum would instead
    # shift most elements by O(step size) — far outside this bound.
    adam_bound = 2 * small_cfg.learning_rate * 0.1 / np.sqrt(1e-3)
    p1 = jax.tree.leaves(new1.params)
    p2 = jax.tree.leaves(new2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=adam_bound
        )


def test_batch_sharding_layout(small_cfg):
    mesh = make_mesh(n_data=8, n_model=1)
    rng = np.random.default_rng(2)
    sharded = shard_batch(_batch(small_cfg, 8, rng), mesh)
    assert sharded.images.sharding.is_equivalent_to(
        batch_sharding(mesh), ndim=sharded.images.ndim
    )


def test_eval_shards_on_non_divisor_mesh(small_cfg):
    """Reference-fixed eval bs=10 on a dp=8 mesh (VERDICT r4 item 7): eval
    batches pad to the next dp multiple (10->16, masked pages) so the batch
    dim SHARDS instead of replicating the whole forward per chip — and the
    result is identical to the unsharded run."""
    from cova_tpu.data.pipeline import DataPipeline
    from cova_tpu.data.synthetic import InMemoryWebDataset
    from cova_tpu.parallel.mesh import eval_batch_sharding
    from cova_tpu.train.trainer import run_eval

    cfg = small_cfg
    ds = InMemoryWebDataset(13, cfg.img_height, seed=7,
                            max_boxes=cfg.max_boxes)
    pipe = DataPipeline(ds, batch_size=10, pad_boxes=cfg.pad_boxes,
                        context_size=cfg.context_size, shuffle=False,
                        num_threads=2)
    model = build_model(cfg)
    _, ex = next(iter(pipe.epoch(0)))
    state = create_train_state(model, cfg, ex, jax.random.PRNGKey(0))

    img_ref, cls_ref = run_eval(
        state, pipe, cfg.n_classes, ("BG", "Price", "Title", "Image")
    )

    mesh = make_mesh(n_data=8, n_model=1)
    sharding = eval_batch_sharding(mesh, pipe.batch_size)
    # Always data-sharded now — no replicate fallback on non-divisors.
    assert sharding.spec and sharding.spec[0] == "data"
    state_m = jax.device_put(state, state_shardings(state, mesh))
    img_m, cls_m = run_eval(
        state_m, pipe, cfg.n_classes, ("BG", "Price", "Title", "Image"),
        sharding=sharding,
    )
    np.testing.assert_array_equal(img_ref, img_m)
    np.testing.assert_array_equal(cls_ref, cls_m)


def test_param_shardings_replicate_small(small_cfg):
    mesh = make_mesh(n_data=4, n_model=2)
    rng = np.random.default_rng(3)
    batch = _batch(small_cfg, 8, rng)
    model = build_model(small_cfg)
    state = create_train_state(model, small_cfg, batch, jax.random.PRNGKey(0))
    sh = param_shardings(state.params, mesh)
    # biases replicated
    spec = sh["decoder_out"]["Dense_0"]["bias"].spec
    assert all(s is None for s in spec)
