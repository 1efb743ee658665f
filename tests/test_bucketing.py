"""Box-dim padding buckets (ROADMAP item 5 / VERDICT r2 item 8).

Slicing the padded box dim to a bucket must be a pure no-op semantically:
every removed row is masked padding, so loss/grads/metrics are identical.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cova_tpu.config import Config
from cova_tpu.data.batching import Batch, bucket_batch, collate, pad_batch
from cova_tpu.data.records import pad_page
from cova_tpu.data.synthetic import synth_image, synth_record
from cova_tpu.models.cova import build_model
from cova_tpu.train.steps import create_train_state, train_step


def _batch(n_pages, img_h, pad_boxes, cs, max_boxes):
    imgs, pages = [], []
    for i in range(n_pages):
        rng = np.random.default_rng((13, i))
        rec = synth_record(str(i), img_h, rng, min_boxes=8,
                           max_boxes=max_boxes)
        imgs.append(synth_image(rec, img_h, rng))
        pages.append(pad_page(rec, pad_boxes, cs))
    return collate(imgs, pages)


def test_bucket_selection():
    b = Batch(
        images=np.zeros((2, 4, 4, 3), np.uint8),
        boxes=np.zeros((2, 232, 4), np.float32),
        labels=np.zeros((2, 232), np.int32),
        box_mask=np.zeros((2, 232), bool),
        context_indices=np.zeros((2, 232, 4), np.int32),
        additional_feats=np.zeros((2, 232, 0), np.float32),
    )
    b.box_mask[0, :50] = True
    b.box_mask[1, :90] = True
    out = bucket_batch(b, (64, 128, 192))
    assert out.boxes.shape[1] == 128  # max valid = 90 -> bucket 128
    b.box_mask[1, :200] = True
    out = bucket_batch(b, (64, 128, 192))
    assert out.boxes.shape[1] == 232  # 200 > 192 -> keep full pad
    assert bucket_batch(b, ()).boxes.shape[1] == 232  # disabled


def test_bucketed_step_is_exact():
    """Same params, same rng: the bucketed batch produces the identical
    loss and updated params as the full-pad batch."""
    cfg = Config(
        img_height=64, max_boxes=24, context_size=3, hidden_dim=32,
        bbox_hidden_dim=8, batch_size=2, compute_dtype="float32",
        drop_prob=0.0,
    )
    batch = _batch(2, 64, cfg.pad_boxes, 3, max_boxes=14)
    batch, _ = pad_batch(batch, 2)
    small = bucket_batch(batch, (16,))
    assert small.boxes.shape[1] == 16 < batch.boxes.shape[1]

    model = build_model(cfg)
    # train_step donates the state buffers: build two identical states.
    state = create_train_state(model, cfg, batch, jax.random.PRNGKey(0))
    state2 = create_train_state(model, cfg, batch, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    s_full, m_full = train_step(state, batch, rng)
    s_b, m_b = train_step(state2, small, rng)
    np.testing.assert_allclose(
        float(m_b["loss_sum"]), float(m_full["loss_sum"]), rtol=1e-6
    )
    assert float(m_b["n_boxes"]) == float(m_full["n_boxes"])
    # Adam's rsqrt renormalization amplifies f32 reduction-order noise on
    # near-zero grads; 1e-3 relative still pins the semantic no-op.
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        ),
        s_full.params, s_b.params,
    )
