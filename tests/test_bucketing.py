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


def test_bucketed_eval_is_exact(tiny_cfg, monkeypatch):
    """run_eval with box buckets returns identical img_acc/class_acc to
    the full-pad eval (sliced rows are masked padding)."""
    from cova_tpu.data.pipeline import DataPipeline
    from cova_tpu.data.synthetic import InMemoryWebDataset
    from cova_tpu.train.trainer import run_eval

    cfg = tiny_cfg
    ds = InMemoryWebDataset(7, cfg.img_height, seed=5, min_boxes=8,
                            max_boxes=14)
    pipe = DataPipeline(ds, batch_size=2, pad_boxes=cfg.pad_boxes,
                        context_size=cfg.context_size, shuffle=False,
                        num_threads=2)
    model = build_model(cfg)
    _, ex = next(iter(pipe.epoch(0)))
    state = create_train_state(model, cfg, ex, jax.random.PRNGKey(0))
    monkeypatch.setenv("COVA_EVAL_CHUNK", "2")

    names = ("BG", "Price", "Title", "Image")
    img_full, cls_full = run_eval(state, pipe, cfg.n_classes, names)
    img_b, cls_b = run_eval(state, pipe, cfg.n_classes, names,
                            box_buckets=(16,))
    np.testing.assert_array_equal(img_b, img_full)
    np.testing.assert_array_equal(cls_b, cls_full)


def test_fit_vmem_fallback_covers_every_bucket(tmp_path, monkeypatch):
    """The compile-OOM fallback must wrap the FIRST dispatch of every
    bucket shape — a bucket can first appear mid-epoch (it depends on a
    batch's sampled max box count), not just on the first step."""
    import cova_tpu.train.trainer as tr
    from cova_tpu.data.batching import _bucket_target, _max_valid
    from cova_tpu.data.pipeline import DataPipeline
    from cova_tpu.ops import bn_pool, roi_pool_pallas
    from cova_tpu.utils.checkpoint import CheckpointManager

    # Restore the global kernel budgets the fallback's shrink mutates.
    monkeypatch.setattr(
        roi_pool_pallas, "_SCOPED_VMEM_BUDGET",
        roi_pool_pallas._SCOPED_VMEM_BUDGET,
    )
    monkeypatch.setattr(bn_pool, "_TU_BUDGET", bn_pool._TU_BUDGET)

    cfg = Config(
        img_height=64, max_boxes=16, context_size=3, hidden_dim=32,
        bbox_hidden_dim=8, batch_size=2, eval_batch_size=2, n_epochs=1,
        compute_dtype="float32", box_buckets=(8,),
        output_dir=str(tmp_path),
    )

    from cova_tpu.data.synthetic import synth_image, synth_record

    class FixedCountDS:
        """Pages with EXACT box counts so batch buckets are deterministic
        (unshuffled batches of 2: small pages -> bucket 8, large -> 16)."""

        n_additional_feat = 0

        def __init__(self, counts, img_h=64):
            self.recs = [
                synth_record(str(i), img_h, np.random.default_rng((5, i)),
                             min_boxes=c, max_boxes=c)
                for i, c in enumerate(counts)
            ]
            self.imgs = [
                synth_image(r, img_h, np.random.default_rng((6, i)))
                for i, r in enumerate(self.recs)
            ]

        def __len__(self):
            return len(self.recs)

        def record(self, i):
            return self.recs[i]

        def image(self, i):
            return self.imgs[i]

    ds = FixedCountDS([5, 6, 5, 6, 14, 15, 14, 15])
    mk = lambda: DataPipeline(  # noqa: E731
        ds, batch_size=2, pad_boxes=cfg.pad_boxes,
        context_size=cfg.context_size, shuffle=False, num_threads=2,
    )
    train_p, val_p = mk(), mk()

    # The bucket shapes epoch 1 will dispatch, derived from the data.
    expected = set()
    for _, b in train_p.epoch(epoch=1):
        b, _ = pad_batch(b, 2)
        expected.add(_bucket_target(_max_valid(b), b.boxes.shape[1],
                                    cfg.box_buckets))
    assert len(expected) >= 2, "fixture must exercise >= 2 bucket shapes"

    model = build_model(cfg)
    _, ex = next(iter(val_p.epoch(0)))
    ex, _ = pad_batch(ex, 2)
    state = create_train_state(model, cfg, ex, jax.random.PRNGKey(0))

    real_step = tr.train_step
    oomed = set()

    def flaky(state, batch, rng):
        k = batch.boxes.shape[1]
        if k not in oomed:
            oomed.add(k)
            raise RuntimeError(
                "RESOURCE_EXHAUSTED: Attempting to allocate VMEM "
                "scoped memory"
            )
        return real_step(state, batch, rng)

    monkeypatch.setattr(tr, "train_step", flaky)
    state, best = tr.fit(
        state, cfg, train_p, val_p,
        CheckpointManager(str(tmp_path / "ckpt")),
    )
    # Every bucket shape OOM'd exactly once and training still completed.
    assert oomed == expected
    assert np.isfinite(best)


def test_bucket_batches_common_target():
    from cova_tpu.data.batching import bucket_batches

    def mk(n_valid):
        b = Batch(
            images=np.zeros((1, 4, 4, 3), np.uint8),
            boxes=np.zeros((1, 232, 4), np.float32),
            labels=np.zeros((1, 232), np.int32),
            box_mask=np.zeros((1, 232), bool),
            context_indices=np.zeros((1, 232, 4), np.int32),
            additional_feats=np.zeros((1, 232, 0), np.float32),
        )
        b.box_mask[0, :n_valid] = True
        return b

    group = bucket_batches([mk(30), mk(100)], (64, 128, 192))
    assert all(b.boxes.shape[1] == 128 for b in group)  # group max governs
    group = bucket_batches([mk(30), mk(220)], (64, 128, 192))
    assert all(b.boxes.shape[1] == 232 for b in group)
    assert bucket_batches([], (64,)) == []


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
