"""Unit tests for per-page record transforms against loop oracles that
transcribe the reference semantics (datasets.py:101-128)."""

import numpy as np
import pytest

from cova_tpu.data.records import (
    PageRecord,
    build_context_indices,
    pad_page,
    sample_background,
    xywh_to_xyxy,
)


def reference_context_indices(n, context_size):
    """Direct transcription of the reference loop (datasets.py:117-128)."""
    out = []
    for i in range(n):
        context = list(range(max(0, i - context_size), i)) + list(
            range(i + 1, min(n, i + context_size + 1))
        )
        out.append(context + [-1] * (2 * context_size - len(context)))
    return np.array(out, dtype=np.int32).reshape(n, 2 * context_size)


@pytest.mark.parametrize("n", [1, 2, 5, 11, 93, 230])
@pytest.mark.parametrize("cs", [1, 3, 12])
def test_context_indices_match_reference(n, cs):
    got = build_context_indices(n, cs)
    want = reference_context_indices(n, cs)
    np.testing.assert_array_equal(got, want)


def test_context_indices_zero_context():
    assert build_context_indices(5, 0).shape == (5, 0)


def _record(n, rng, n_feat=0):
    boxes = rng.uniform(0, 50, size=(n, 4)).astype(np.float32)
    labels = np.zeros(n, np.int32)
    labels[rng.choice(n, 3, replace=False)] = [1, 2, 3]
    feats = (
        rng.normal(size=(n, n_feat)).astype(np.float32) if n_feat else None
    )
    return PageRecord("7", boxes, labels, feats)


def test_sample_background_keeps_all_non_bg(rng):
    rec = _record(50, rng)
    out = sample_background(rec, 0.5, np.random.default_rng(1))
    # all non-BG kept
    for c in (1, 2, 3):
        assert (out.labels == c).sum() == 1
    assert out.n_boxes < rec.n_boxes
    # order preserved: kept boxes appear in original relative order
    kept_rows = [
        np.flatnonzero((rec.boxes_xywh == b).all(1))[0]
        for b in out.boxes_xywh
    ]
    assert kept_rows == sorted(kept_rows)


def test_sample_background_expected_count(rng):
    rec = _record(100, rng)
    out = sample_background(rec, 0.9, np.random.default_rng(2))
    # int(0.9*100)=90 sampled, union with 3 non-BG: between 90 and 93
    assert 90 <= out.n_boxes <= 93


def test_sample_background_reproducible(rng):
    rec = _record(80, rng)
    a = sample_background(rec, 0.7, np.random.default_rng(3))
    b = sample_background(rec, 0.7, np.random.default_rng(3))
    np.testing.assert_array_equal(a.boxes_xywh, b.boxes_xywh)


def test_sample_background_fraction_one_identity(rng):
    rec = _record(10, rng)
    assert sample_background(rec, 1.0, np.random.default_rng(0)) is rec


def test_xywh_to_xyxy():
    b = np.array([[1.0, 2.0, 3.0, 4.0]], np.float32)
    np.testing.assert_allclose(xywh_to_xyxy(b), [[1, 2, 4, 6]])


def test_pad_page_shapes_and_mask(rng):
    rec = _record(10, rng, n_feat=2)
    page = pad_page(rec, pad_boxes=16, context_size=3, n_additional_feat=2)
    assert page.boxes_xyxy.shape == (16, 4)
    assert page.context_indices.shape == (16, 6)
    assert page.additional_feats.shape == (16, 2)
    assert page.box_mask.sum() == 10
    assert (page.labels[10:] == 0).all()
    assert (page.context_indices[10:] == -1).all()
    # coords converted to xyxy
    np.testing.assert_allclose(
        page.boxes_xyxy[:10], xywh_to_xyxy(rec.boxes_xywh)
    )


def test_pad_page_overflow_raises(rng):
    rec = _record(20, rng)
    with pytest.raises(ValueError):
        pad_page(rec, pad_boxes=16, context_size=3)
