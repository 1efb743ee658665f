"""Pure per-page record transforms: sampling, context building, padding.

Re-implements the semantics of the reference dataset's ``__getitem__``
(``/root/reference/datasets.py:80-132``) as pure numpy functions with explicit
RNG, so they are unit-testable and reproducible (the reference's DataLoader
worker RNG is unseeded for BG sampling; here every draw is keyed).

The key departure from the reference is the output layout: instead of ragged
per-page arrays that a collate function flattens with running index offsets
(``datasets.py:141-190``), every page is padded to a static ``pad_boxes`` count
with a validity mask, and context indices stay **per-image** (0..P-1 or -1).
Static shapes are what XLA/TPU require; the flat-batch offset trick would force
dynamic shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class PageRecord:
    """One webpage after load, before padding. Boxes in DOM preorder."""

    page_id: str
    boxes_xywh: np.ndarray  # [n, 4] float32, [x, y, w, h]
    labels: np.ndarray  # [n] int32
    additional_feats: Optional[np.ndarray] = None  # [n, F] float32 or None

    @property
    def n_boxes(self) -> int:
        return int(self.boxes_xywh.shape[0])


def sample_background(
    record: PageRecord, sampling_fraction: float, rng: np.random.Generator
) -> PageRecord:
    """Randomly keep a fraction of BG boxes; keep all non-BG; preserve order.

    Matches ``datasets.py:101-110``: draw a permutation, take the first
    ``int(f * n)`` positions, union with all non-BG indices, sort+unique.
    """
    if not (0.0 < sampling_fraction <= 1.0):
        raise ValueError("sampling_fraction must be in (0, 1]")
    if sampling_fraction >= 1.0:
        return record
    n = record.n_boxes
    sampled = rng.permutation(n)[: int(sampling_fraction * n)]
    keep = np.unique(
        np.concatenate([np.where(record.labels != 0)[0], sampled])
    )
    return PageRecord(
        page_id=record.page_id,
        boxes_xywh=record.boxes_xywh[keep],
        labels=record.labels[keep],
        additional_feats=(
            None
            if record.additional_feats is None
            else record.additional_feats[keep]
        ),
    )


def build_context_indices(n_boxes: int, context_size: int) -> np.ndarray:
    """K-neighborhood in DOM preorder, vectorized.

    For box i: the up-to-``context_size`` predecessors (ascending), then the
    up-to-``context_size`` successors (ascending), left-packed and padded with
    -1 to width ``2 * context_size`` — byte-identical to the reference loop at
    ``datasets.py:117-128``.
    """
    if context_size <= 0:
        return np.zeros((n_boxes, 0), dtype=np.int32)
    offsets = np.concatenate(
        [np.arange(-context_size, 0), np.arange(1, context_size + 1)]
    )  # predecessors ascending, then successors ascending
    cand = np.arange(n_boxes)[:, None] + offsets[None, :]  # [n, 2K]
    valid = (cand >= 0) & (cand < n_boxes)
    cand = np.where(valid, cand, -1)
    #

    # Left-pack valid entries, preserving order (stable argsort of ~valid).
    order = np.argsort(~valid, axis=1, kind="stable")
    return np.take_along_axis(cand, order, axis=1).astype(np.int32)


def xywh_to_xyxy(boxes_xywh: np.ndarray) -> np.ndarray:
    """[x, y, w, h] -> [x1, y1, x2, y2] (``datasets.py:114-115``)."""
    out = boxes_xywh.astype(np.float32).copy()
    out[:, 2:] += out[:, :2]
    return out


@dataclasses.dataclass
class PaddedPage:
    """Statically-shaped page, ready to stack into a batch."""

    page_id: str
    boxes_xyxy: np.ndarray  # [P, 4] float32
    labels: np.ndarray  # [P] int32 (padding rows are 0 and masked)
    box_mask: np.ndarray  # [P] bool
    context_indices: np.ndarray  # [P, 2K] int32, per-image, -1 = none
    additional_feats: np.ndarray  # [P, F] float32 (F may be 0)


def pad_page(
    record: PageRecord,
    pad_boxes: int,
    context_size: int,
    n_additional_feat: int = 0,
) -> PaddedPage:
    n = record.n_boxes
    if n > pad_boxes:
        raise ValueError(
            f"page {record.page_id} has {n} boxes > pad_boxes={pad_boxes}"
        )
    P = pad_boxes
    boxes = np.zeros((P, 4), dtype=np.float32)
    boxes[:n] = xywh_to_xyxy(record.boxes_xywh)
    labels = np.zeros((P,), dtype=np.int32)
    labels[:n] = record.labels
    mask = np.zeros((P,), dtype=bool)
    mask[:n] = True
    ctx = np.full((P, 2 * context_size), -1, dtype=np.int32)
    if context_size > 0 and n > 0:
        ctx[:n] = build_context_indices(n, context_size)
    feats = np.zeros((P, n_additional_feat), dtype=np.float32)
    if record.additional_feats is not None and n_additional_feat > 0:
        feats[:n] = record.additional_feats
    return PaddedPage(
        page_id=record.page_id,
        boxes_xyxy=boxes,
        labels=labels,
        box_mask=mask,
        context_indices=ctx,
        additional_feats=feats,
    )
