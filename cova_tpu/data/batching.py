"""Padded batch assembly: list of pages -> statically-shaped arrays.

Replaces the reference's ragged ``custom_collate_fn``
(``/root/reference/datasets.py:141-190``). Where the reference concatenates
variable-length box lists into a flat ``[N_total, 5]`` tensor and offsets
context indices by a running box count, this builds rectangular ``[B, P, ...]``
arrays with a validity mask — the layout XLA needs for a single compiled train
step. Context indices remain per-image; the model's GAT resolves them inside
each image's row block, so no offsetting is required.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence

import numpy as np

from .records import PaddedPage


class Batch(NamedTuple):
    """One statically-shaped training/eval batch (a JAX pytree).

    ``images`` are uint8, shipped in space-to-depth(4) form
    [B, H/4, W/4, 48] when H and W divide by 4 (raw [B, H, W, 3] NHWC
    otherwise): a 3-channel tensor is lane-padded 3->128 in TPU tiled
    memory, so rearranging on-device costs ~6 ms/step at the flagship
    shape while the host-side bijection is free at the device
    (``ops.conv_stem.s2d4_host``; the model accepts both layouts).
    Normalization to [0, 1] happens on-device (the reference does
    ToTensor on host, ``datasets.py:41-45``).
    """

    images: np.ndarray  # [B, H/4, W/4, 48] (or [B, H, W, 3]) uint8
    boxes: np.ndarray  # [B, P, 4] float32 x1y1x2y2 (image coords)
    labels: np.ndarray  # [B, P] int32
    box_mask: np.ndarray  # [B, P] bool
    context_indices: np.ndarray  # [B, P, 2K] int32 per-image, -1 = pad
    additional_feats: np.ndarray  # [B, P, F] float32 (F may be 0)

    @property
    def batch_size(self) -> int:
        return int(self.images.shape[0])


def collate(
    images: Sequence[np.ndarray], pages: Sequence[PaddedPage]
) -> Batch:
    assert len(images) == len(pages)
    h, w, c = images[0].shape
    if c == 3 and h % 4 == 0 and w % 4 == 0:
        from ..ops.conv_stem import s2d4_host

        images = [s2d4_host(im) for im in images]
    # The C++ batch decoder already returns one contiguous [B, ...] array;
    # passing it through as-is avoids a ~40 MB re-stack copy per batch.
    stacked = (
        images if isinstance(images, np.ndarray) else np.stack(images, 0)
    )
    return Batch(
        images=stacked,
        boxes=np.stack([p.boxes_xyxy for p in pages], 0),
        labels=np.stack([p.labels for p in pages], 0),
        box_mask=np.stack([p.box_mask for p in pages], 0),
        context_indices=np.stack([p.context_indices for p in pages], 0),
        additional_feats=np.stack([p.additional_feats for p in pages], 0),
    )


def pad_batch(batch: Batch, target_b: int) -> tuple[Batch, np.ndarray]:
    """Pad the leading batch dim to ``target_b`` (for the last partial batch
    under a fixed-shape jitted step). Returns (padded batch, page validity
    mask [target_b]).

    Padded slots are filled by CYCLING the real pages, not with zeros: the
    backbone's image-level BatchNorm computes batch statistics over every
    page in the batch (it is not mask-aware, matching the reference, which
    never sees padding — ``/root/reference/models.py:48-56``), so zero
    images would skew both the batch stats and the running stats. Repeated
    real pages contribute natural image statistics; their boxes stay fully
    masked out, so loss, metrics, and the box-level masked BNs are
    unaffected.

    The residual deviation (duplicated pages get extra weight in the
    image-BN *batch* statistics vs the reference's smaller ragged batch)
    is measured, worst case b=3 -> B=8 at 256px
    (``scripts/measure_partial_batch.py``): loss rel delta 6.1e-4, grad
    cosine 0.9949, BN running-stat shift <= 2.1% for that single step —
    and only the last train batch of an epoch can be partial, so the
    EMA-averaged effect over an epoch is smaller still.
    """
    b = batch.batch_size
    if b == target_b:
        return batch, np.ones((b,), dtype=bool)
    assert b < target_b
    pad = target_b - b
    fill = np.arange(pad) % b  # cycle real pages into the padded slots

    def _pad(x: np.ndarray) -> np.ndarray:
        return np.concatenate([x, x[fill]], axis=0)

    page_mask = np.zeros((target_b,), dtype=bool)
    page_mask[:b] = True
    padded = Batch(*[_pad(np.asarray(f)) for f in batch])
    # Keep padded pages fully masked out.
    padded = padded._replace(
        box_mask=np.where(page_mask[:, None], padded.box_mask, False)
    )
    return padded, page_mask


def _bucket_target(max_valid: int, p_full: int,
                   buckets: Sequence[int]) -> int:
    for p in sorted(buckets):
        if p >= max_valid:
            return min(p, p_full)
    return p_full


def _slice_boxes(batch: Batch, target: int) -> Batch:
    return batch._replace(
        boxes=batch.boxes[:, :target],
        labels=batch.labels[:, :target],
        box_mask=batch.box_mask[:, :target],
        context_indices=batch.context_indices[:, :target],
        additional_feats=batch.additional_feats[:, :target],
    )


def _max_valid(batch: Batch) -> int:
    return int(batch.box_mask.sum(axis=1).max()) if batch.box_mask.size else 0


def bucket_batch(
    batch: Batch, buckets: Sequence[int], lower_bound: int = 0
) -> Batch:
    """Slice the box dim down to the smallest bucket holding every page's
    valid boxes (valid rows are front-packed by ``records.pad_page``).

    The real dataset averages 93 boxes/page with max 230
    (``splits/bbox_stats.txt``), so most batches fit a much smaller P than
    the global 232 pad — the jitted step compiles once per bucket and all
    box-dim work (RoIPool box loop, GAT, decoder, masked BNs) shrinks
    proportionally. Semantics are unchanged: every sliced-off row was
    masked padding, and per-image context indices are always < the page's
    valid count <= the bucket.

    ``lower_bound``: minimum box count the bucket must hold, regardless of
    this batch's content. Multi-host training passes the GLOBAL batch's max
    count (``DataPipeline.global_batch_max_counts``) so every host compiles
    and dispatches the same per-bucket program — a host whose local stripe
    happens to be all-small pages must not pick a smaller bucket than its
    peers, or the step's collectives deadlock.
    """
    p_full = batch.boxes.shape[1]
    target = (
        _bucket_target(max(_max_valid(batch), lower_bound), p_full, buckets)
        if buckets
        else p_full
    )
    if target >= p_full:
        return batch
    return _slice_boxes(batch, target)


def bucket_batches(batches: Sequence[Batch],
                   buckets: Sequence[int]) -> List[Batch]:
    """Bucket a GROUP of batches to one common box dim (the largest any
    member needs) — used by the chunked eval path, where a whole chunk is
    stacked into one jitted dispatch and must share a static shape."""
    batches = list(batches)
    if not buckets or not batches:
        return batches
    p_full = batches[0].boxes.shape[1]
    target = _bucket_target(max(map(_max_valid, batches)), p_full, buckets)
    if target >= p_full:
        return batches
    return [_slice_boxes(b, target) for b in batches]


def page_ids_of(pages: Sequence[PaddedPage]) -> List[str]:
    return [p.page_id for p in pages]
