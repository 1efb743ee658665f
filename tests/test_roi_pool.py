"""RoIPool: XLA sparse-table implementation vs the numpy oracle, plus
torch-parity spot checks of the quantization rules."""

import numpy as np
import pytest

from cova_tpu.ops.roi_pool import roi_pool, roi_pool_reference


def _random_case(rng, B=2, H=16, W=16, C=8, P=12, img=64):
    fm = rng.normal(size=(B, H, W, C)).astype(np.float32)
    x1 = rng.uniform(0, img - 2, (B, P))
    y1 = rng.uniform(0, img - 2, (B, P))
    x2 = x1 + rng.uniform(0.5, img - x1)
    y2 = y1 + rng.uniform(0.5, img - y1)
    boxes = np.stack([x1, y1, x2, y2], -1).astype(np.float32)
    return fm, boxes


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_oracle_random(seed):
    rng = np.random.default_rng(seed)
    fm, boxes = _random_case(rng)
    got = np.asarray(
        roi_pool(fm, boxes, spatial_scale=0.25, out_h=3, out_w=3)
    )
    want = roi_pool_reference(fm, boxes, spatial_scale=0.25)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_full_image_box():
    rng = np.random.default_rng(3)
    fm = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    boxes = np.array([[[0, 0, 32, 32]]], np.float32)  # whole image, scale 1/4
    got = np.asarray(roi_pool(fm, boxes, spatial_scale=0.25))
    want = roi_pool_reference(fm, boxes, spatial_scale=0.25)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # last bin of a full-image roi must see the bottom-right corner region
    assert got[0, 0, 2, 2, 0] == fm[0, 5:8, 5:8, 0].max()


def test_tiny_box_single_cell():
    """A sub-cell box pools exactly one feature cell into all 9 bins."""
    fm = np.arange(8 * 8 * 1, dtype=np.float32).reshape(1, 8, 8, 1)
    boxes = np.array([[[8.4, 12.4, 8.6, 12.6]]], np.float32)  # cell (3, 2)
    got = np.asarray(roi_pool(fm, boxes, spatial_scale=0.25))
    assert (got == fm[0, 3, 2, 0]).all()


def test_round_half_away():
    """Coordinate quantization must round .5 away from zero (C++ roundf),
    not to-even: x=2 at scale 0.25 -> round(0.5) == 1, not 0."""
    fm = np.zeros((1, 8, 8, 1), np.float32)
    fm[0, :, 0, 0] = 1.0  # column 0 distinctive
    fm[0, :, 1, 0] = 5.0
    boxes = np.array([[[2.0, 0.0, 2.0, 31.0]]], np.float32)
    got = np.asarray(roi_pool(fm, boxes, spatial_scale=0.25))
    want = roi_pool_reference(fm, boxes, spatial_scale=0.25)
    np.testing.assert_allclose(got, want)
    assert (got == 5.0).all()  # starts at column 1 == round-half-up


def test_degenerate_and_padding_boxes():
    """Zero-area boxes (incl. all-zero padding rows) produce the 1-cell roi
    torchvision produces; out-of-range boxes clamp to empty -> 0."""
    rng = np.random.default_rng(4)
    fm = rng.normal(size=(1, 8, 8, 2)).astype(np.float32)
    boxes = np.array(
        [[[0, 0, 0, 0], [100, 100, 120, 120], [5, 5, 5, 5]]], np.float32
    )
    got = np.asarray(roi_pool(fm, boxes, spatial_scale=0.25))
    want = roi_pool_reference(fm, boxes, spatial_scale=0.25)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_batch_independence():
    rng = np.random.default_rng(5)
    fm, boxes = _random_case(rng, B=3)
    full = np.asarray(roi_pool(fm, boxes, spatial_scale=0.25))
    for b in range(3):
        one = np.asarray(
            roi_pool(fm[b : b + 1], boxes[b : b + 1], spatial_scale=0.25)
        )
        np.testing.assert_allclose(full[b : b + 1], one, rtol=1e-6)


def test_non_square_output():
    rng = np.random.default_rng(6)
    fm, boxes = _random_case(rng, B=1, P=4)
    got = np.asarray(
        roi_pool(fm, boxes, spatial_scale=0.25, out_h=2, out_w=5)
    )
    want = roi_pool_reference(fm, boxes, spatial_scale=0.25, out_h=2, out_w=5)
    assert got.shape == (1, 4, 2, 5, 8)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
