"""Regression tests for review-found semantic divergences (round 3):
exact RoI spatial scale, roundf quantization on negative coords, and
running-stat protection on all-padding batches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cova_tpu.ops.roi_pool import _quantize, roi_pool, roi_pool_reference
from cova_tpu.ops.roi_pool_pallas import roi_pool_pallas


def test_quantize_matches_roundf_on_negative_coords():
    """torchvision quantizes with C++ roundf (half away from zero); the
    old floor(v*scale + 0.5) diverged at negative halves."""
    v = jnp.asarray([-2.0, -6.0, -1.9, 1.9, 2.0, 0.0, -0.1])
    got = np.asarray(_quantize(v, 0.25))
    # roundf(v * 0.25): [-0.5 -> -1, -1.5 -> -2, -0.475 -> 0, ...]
    np.testing.assert_array_equal(got, [-1, -2, 0, 0, 1, 0, 0])


def test_roi_pool_negative_coords_consistent():
    """Both implementations and the oracle agree on boxes with negative
    coordinates (nothing clips user-supplied boxes before quantization)."""
    rng = np.random.default_rng(0)
    fm = rng.normal(size=(1, 16, 16, 8)).astype(np.float32)
    boxes = np.array(
        [[[-2.0, -6.0, 20.0, 30.0], [-0.5, 3.0, 12.0, 10.0]]], np.float32
    )
    mask = np.ones((1, 2), bool)
    want = roi_pool_reference(fm, boxes, spatial_scale=0.25)
    got_xla = np.asarray(
        roi_pool(jnp.asarray(fm), jnp.asarray(boxes), spatial_scale=0.25)
    )
    got_pallas = np.asarray(
        roi_pool_pallas(
            jnp.asarray(fm), jnp.asarray(boxes), jnp.asarray(mask),
            0.25, 3, 3, True,
        )
    )
    np.testing.assert_allclose(got_xla, want, rtol=1e-6)
    np.testing.assert_allclose(got_pallas, want, rtol=1e-6)


def test_model_spatial_scale_is_exact_ratio(monkeypatch):
    """For inputs whose H is not an exact multiple of the backbone output
    (raw-RGB path), the RoI scale must be the true fm_H/img_H ratio — the
    reference measures it with a dummy forward (models.py:52-56); the old
    1/(img_h // fm_h) floor-division diverged (e.g. 1/3 vs 5/18)."""
    import cova_tpu.models.cova as mcova
    from cova_tpu.config import Config
    from cova_tpu.models.cova import build_model

    captured = {}
    real = mcova.roi_pool

    def spy(fm, boxes, *, spatial_scale, out_h, out_w):
        captured["scale"] = spatial_scale
        captured["fm_h"] = fm.shape[1]
        return real(
            fm, boxes, spatial_scale=spatial_scale, out_h=out_h, out_w=out_w
        )

    monkeypatch.setattr(mcova, "roi_pool", spy)
    cfg = Config(
        img_height=18, max_boxes=4, context_size=2, hidden_dim=16,
        bbox_hidden_dim=8, compute_dtype="float32",
    )
    model = build_model(cfg)
    images = np.zeros((1, 18, 18, 3), np.uint8)
    boxes = np.array([[[1.0, 1.0, 10.0, 10.0]] * 4], np.float32)
    bmask = np.ones((1, 4), bool)
    ctx = np.full((1, 4, 4), -1, np.int32)
    variables = model.init(
        jax.random.PRNGKey(0), images, boxes, bmask, ctx, train=False
    )
    model.apply(variables, images, boxes, bmask, ctx, train=False)
    assert "scale" in captured
    fm_h = captured["fm_h"]
    assert captured["scale"] == pytest.approx(fm_h / 18.0)
    if 18 % fm_h:  # the buggy value would differ
        assert captured["scale"] != pytest.approx(1.0 / (18 // fm_h))


def test_masked_bn_all_padding_batch_keeps_running_stats():
    """An all-False mask batch must not decay running stats toward (0, 0)."""
    from cova_tpu.models.layers import MaskedBatchNorm

    bn = MaskedBatchNorm(4, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 3, 4)),
                    jnp.float32)
    mask = jnp.ones((2, 3), bool)
    variables = bn.init(jax.random.PRNGKey(0), x, mask,
                        use_running_average=False)
    # One real batch -> stats move.
    _, s1 = bn.apply(variables, x, mask, use_running_average=False,
                     mutable=["batch_stats"])
    # Then an all-padding batch -> stats must be unchanged.
    v2 = {"params": variables["params"], **s1}
    _, s2 = bn.apply(v2, x, jnp.zeros((2, 3), bool),
                     use_running_average=False, mutable=["batch_stats"])
    np.testing.assert_array_equal(
        np.asarray(s2["batch_stats"]["mean"]),
        np.asarray(s1["batch_stats"]["mean"]),
    )
    np.testing.assert_array_equal(
        np.asarray(s2["batch_stats"]["var"]),
        np.asarray(s1["batch_stats"]["var"]),
    )
    # And a real batch still updates (the guard must not freeze stats).
    _, s3 = bn.apply(v2, x * 2.0, mask, use_running_average=False,
                     mutable=["batch_stats"])
    assert not np.allclose(
        np.asarray(s3["batch_stats"]["mean"]),
        np.asarray(s2["batch_stats"]["mean"]),
    )


@pytest.mark.parametrize("roi_fwd", ["walk", "ranged"])
def test_model_pallas_path_matches_xla(roi_fwd, monkeypatch):
    """Full-model integration of the Pallas RoIPool path (interpret mode):
    identical logits to the XLA path under the same variables — pins the
    model-level wiring (fold/unfold shapes, spatial scale, mask plumbing)
    that otherwise only executes on real TPU."""
    import cova_tpu.models.cova as mcova
    from cova_tpu.config import Config
    from cova_tpu.models.cova import build_model

    monkeypatch.setenv("COVA_ROI_FWD", roi_fwd)
    orig = mcova.roi_pool_pallas
    monkeypatch.setattr(
        mcova, "roi_pool_pallas",
        lambda fm, b, m, s, oh, ow: orig(fm, b, m, s, oh, ow, True),
    )
    cfg = Config(
        img_height=64, max_boxes=8, context_size=3, hidden_dim=16,
        bbox_hidden_dim=8, compute_dtype="float32",
    )
    rng = np.random.default_rng(3)
    images = rng.integers(0, 255, (2, 64, 64, 3), np.uint8)
    boxes = np.zeros((2, cfg.pad_boxes, 4), np.float32)
    boxes[:, :6] = rng.uniform(0, 40, (2, 6, 4)).astype(np.float32)
    boxes[..., 2:] += boxes[..., :2] + 2.0
    bmask = np.zeros((2, cfg.pad_boxes), bool)
    bmask[:, :6] = True
    ctx = np.full((2, cfg.pad_boxes, 6), -1, np.int32)

    def logits(impl):
        from cova_tpu.models.cova import CoVA

        model = CoVA(
            hidden_dim=cfg.hidden_dim,
            bbox_hidden_dim=cfg.bbox_hidden_dim,
            roi_impl=impl,
            compute_dtype=jnp.float32,
        )
        variables = model.init(
            jax.random.PRNGKey(0), images, boxes, bmask, ctx, train=False
        )
        out = model.apply(
            variables, images, boxes, bmask, ctx, train=False
        )
        return np.asarray(out.logits)

    # Padded rows legitimately differ: the pallas path zeroes masked
    # boxes' pooled features while the XLA op (maskless) pools the
    # degenerate (0,0,0,0) box — both are discarded by mask downstream.
    np.testing.assert_allclose(
        logits("pallas")[bmask], logits("xla")[bmask], rtol=1e-5, atol=1e-5
    )
