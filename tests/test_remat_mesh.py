"""COVA_REMAT under the device mesh: the BASELINE stretch config is
"ResNet-50 backbone, 2x-res screenshots, larger K context, multi-chip data
parallel" (BASELINE.json configs[4]), and on a 16 G chip that geometry only
fits WITH per-block rematerialization (artifacts/tpu_r5/stretch_full.err)
— so remat + dp/tp sharding is the real multi-chip operating point. Pin
that the remat-wrapped blocks compose with pjit sharding: one sharded
remat step == the same step unsharded without remat."""

import jax
import numpy as np

from cova_tpu.config import Config
from cova_tpu.data.batching import Batch
from cova_tpu.models.cova import build_model
from cova_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    state_shardings,
)
from cova_tpu.train.steps import create_train_state, train_step


def _batch(cfg, b, rng):
    P, K = cfg.pad_boxes, cfg.n_context
    imgs = rng.integers(0, 255, (b, cfg.img_height, cfg.img_height, 3),
                        dtype=np.uint8)
    boxes = rng.uniform(1, 20, (b, P, 4)).astype(np.float32)
    boxes[..., 2:] += boxes[..., :2]
    mask = np.zeros((b, P), bool)
    mask[:, :8] = True
    labels = np.zeros((b, P), np.int32)
    labels[:, :3] = [1, 2, 3]
    ctx = np.full((b, P, K), -1, np.int32)
    ctx[:, :8, :2] = rng.integers(0, 8, (b, 8, 2))
    return Batch(
        images=imgs, boxes=boxes, labels=labels, box_mask=mask,
        context_indices=ctx,
        additional_feats=np.zeros((b, P, 0), np.float32),
    )


def test_remat_dp_tp_step_matches_unsharded_no_remat(monkeypatch):
    assert len(jax.devices()) >= 8
    # A full deep backbone (8 blocks, stride 32 -> img_height >= 32);
    # resnet18 rather than resnet50 to halve the two CPU-mesh compiles —
    # the Bottleneck remat path itself is pinned by tests/test_remat.py,
    # and the mesh composition under test is block-type-independent.
    cfg = Config(
        img_height=32, max_boxes=16, context_size=2, hidden_dim=16,
        bbox_hidden_dim=8, batch_size=8, compute_dtype="float32",
        backbone="resnet18",
    )
    rng = np.random.default_rng(3)
    batch = _batch(cfg, 8, rng)
    model = build_model(cfg)

    monkeypatch.setenv("COVA_REMAT", "0")
    state1 = create_train_state(model, cfg, batch, jax.random.PRNGKey(0))
    new1, m1 = train_step(state1, batch, jax.random.PRNGKey(1))
    loss1 = float(m1["loss_sum"])

    monkeypatch.setenv("COVA_REMAT", "1")
    mesh = make_mesh(n_data=4, n_model=2)
    state2 = create_train_state(model, cfg, batch, jax.random.PRNGKey(0))
    state2 = jax.device_put(state2, state_shardings(state2, mesh))
    sharded = shard_batch(batch, mesh)
    with mesh:
        new2, m2 = train_step(state2, sharded, jax.random.PRNGKey(1))
    loss2 = float(m2["loss_sum"])
    # rtol 5e-5, not the shallow-stem test's 1e-5: remat legitimately
    # changes f32 fusion/reduction order through 8 blocks (measured rel
    # delta 1.5e-5 on the 16-block rn50 at this geometry).
    np.testing.assert_allclose(loss1, loss2, rtol=5e-5)

    # Same Adam reduction-order bound as
    # test_sharding.test_sharded_matches_single_device.
    adam_bound = 2 * cfg.learning_rate * 0.1 / np.sqrt(1e-3)
    for a, b in zip(
        jax.tree.leaves(new1.params), jax.tree.leaves(new2.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=adam_bound
        )
