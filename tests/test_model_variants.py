"""CoVA flag variants the reference CLI exposes: no-context, no-bbox-encoder,
additional features, alternate backbones (utils.py:15-32, models.py:10-34)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cova_tpu.config import Config
from cova_tpu.models.cova import build_model


def _inputs(cfg, rng, b=2, n_valid=6):
    P, K = cfg.pad_boxes, cfg.n_context
    imgs = rng.integers(
        0, 255, (b, cfg.img_height, cfg.img_height, 3), dtype=np.uint8
    )
    boxes = rng.uniform(1, 40, (b, P, 4)).astype(np.float32)
    boxes[..., 2:] += boxes[..., :2]
    mask = np.zeros((b, P), bool)
    mask[:, :n_valid] = True
    ctx = np.full((b, P, K), -1, np.int32)
    if K:
        ctx[:, :n_valid, : min(K, 3)] = rng.integers(
            0, n_valid, (b, n_valid, min(K, 3))
        )
    feats = rng.normal(size=(b, P, cfg.n_additional_feat)).astype(np.float32)
    return imgs, boxes, mask, ctx, feats


def _run(cfg, rng, train=False):
    model = build_model(cfg)
    imgs, boxes, mask, ctx, feats = _inputs(cfg, rng)
    variables = model.init(
        jax.random.PRNGKey(0), imgs, boxes, mask, ctx,
        feats if cfg.use_additional_feat else None, train=False,
    )
    kwargs = {}
    if train:
        kwargs = dict(
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
    out = model.apply(
        variables, imgs, boxes, mask, ctx,
        feats if cfg.use_additional_feat else None, train=train, **kwargs
    )
    return out[0] if train else out


BASE = dict(
    img_height=32, max_boxes=8, context_size=2, hidden_dim=16,
    bbox_hidden_dim=8, compute_dtype="float32",
)


def test_no_context(rng):
    cfg = Config(**{**BASE, "context_size": 0})
    out = _run(cfg, rng)
    assert out.logits.shape == (2, cfg.pad_boxes, 4)
    assert out.attn_wts is None


def test_no_bbox_encoder(rng):
    cfg = Config(**{**BASE, "bbox_hidden_dim": 0})
    out = _run(cfg, rng)
    assert np.isfinite(np.asarray(out.logits)).all()


def test_additional_features(rng):
    cfg = Config(
        **BASE, use_additional_feat=True, n_additional_feat=5
    )
    out = _run(cfg, rng)
    assert np.isfinite(np.asarray(out.logits)).all()


def test_param_count_additional_feats(rng):
    """CoVA++ adds BN params + wider decoder/GAT rows (README: 1.7M)."""
    cfg_base = Config(**BASE)
    cfg_pp = Config(**BASE, use_additional_feat=True, n_additional_feat=5)
    def count(cfg):
        model = build_model(cfg)
        imgs, boxes, mask, ctx, feats = _inputs(cfg, np.random.default_rng(0))
        v = model.init(
            jax.random.PRNGKey(0), imgs, boxes, mask, ctx,
            feats if cfg.use_additional_feat else None, train=False,
        )
        return sum(x.size for x in jax.tree.leaves(v["params"]))
    assert count(cfg_pp) > count(cfg_base)


@pytest.mark.parametrize("backbone", ["resnet34_stem", "resnet50_stem"])
def test_alternate_backbones(rng, backbone):
    cfg = Config(**{**BASE, "backbone": backbone})
    out = _run(cfg, rng)
    assert out.logits.shape == (2, cfg.pad_boxes, 4)


def test_flagship_param_count(rng):
    """Default config must reproduce the reference's 1.6M parameter count
    (README table; count_parameters print at models.py:92)."""
    cfg = Config(
        img_height=64, max_boxes=8, compute_dtype="float32"
    )  # geometry doesn't change param count
    model = build_model(cfg)
    imgs, boxes, mask, ctx, _ = _inputs(cfg, rng)
    v = model.init(jax.random.PRNGKey(0), imgs, boxes, mask, ctx, train=False)
    n = sum(x.size for x in jax.tree.leaves(v["params"]))
    assert n == 1_616_485


def test_train_mode_updates_stats(rng):
    cfg = Config(**BASE)
    logits = _run(cfg, rng, train=True).logits
    assert np.isfinite(np.asarray(logits)).all()


def test_full_resnet18_backbone(rng):
    """Full (4-stage, stride-32) backbone for the scaled configs."""
    cfg = Config(**{**BASE, "img_height": 64, "backbone": "resnet18"})
    out = _run(cfg, rng)
    assert out.logits.shape == (2, cfg.pad_boxes, 4)
    assert np.isfinite(np.asarray(out.logits)).all()
