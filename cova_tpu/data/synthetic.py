"""Synthetic webpage generator for tests and benchmarks.

The reference's dataset lives outside its repo (``../data/`` —
``/root/reference/constants.py:3``); for self-contained tests and benchmarks
we synthesize pages with the same statistics: 11..230 boxes per page in
"preorder" (``splits/bbox_stats.txt``), exactly one box each of Price/Title/
Image per page (``README.md:17``), square screenshots.

Pages can be materialized to disk in the reference's on-disk format
(imgs/*.png + bboxes/*.csv) to exercise the real IO path, or kept in memory.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from .dataset import WebDataset
from .records import PageRecord


def synth_record(
    page_id: str,
    img_h: int,
    rng: np.random.Generator,
    min_boxes: int = 11,
    max_boxes: int = 230,
    n_additional_feat: int = 0,
) -> PageRecord:
    n = int(rng.integers(min_boxes, max_boxes + 1))
    # Random boxes with w,h >= 2 px, inside the image.
    x = rng.uniform(0, img_h - 4, size=n)
    y = rng.uniform(0, img_h - 4, size=n)
    w = rng.uniform(2, np.maximum(img_h - x, 3))
    h = rng.uniform(2, np.maximum(img_h - y, 3))
    boxes = np.stack([x, y, w, h], axis=1).astype(np.float32)
    labels = np.zeros((n,), dtype=np.int32)
    # Exactly one box per non-BG class.
    pos = rng.choice(n, size=3, replace=False)
    labels[pos] = [1, 2, 3]
    feats = None
    if n_additional_feat > 0:
        feats = rng.normal(size=(n, n_additional_feat)).astype(np.float32)
    return PageRecord(page_id, boxes, labels, feats)


def synth_image(
    record: PageRecord, img_h: int, rng: np.random.Generator
) -> np.ndarray:
    """Screenshot-like uint8 image: light background, boxes drawn as blocks
    whose fill encodes their class (so a model can actually learn)."""
    img = np.full((img_h, img_h, 3), 245, dtype=np.uint8)
    palette = {
        0: np.array([200, 200, 200], np.uint8),
        1: np.array([220, 40, 40], np.uint8),  # Price: red-ish
        2: np.array([40, 40, 220], np.uint8),  # Title: blue-ish
        3: np.array([40, 220, 40], np.uint8),  # Image: green-ish
    }
    # BG boxes first, target boxes last, so a random BG box cannot paint
    # over a Price/Title/Image box and destroy the visual signal.
    order = np.argsort(record.labels != 0, kind="stable")
    for (bx, by, bw, bh), lab in zip(
        record.boxes_xywh[order], record.labels[order]
    ):
        x1, y1 = int(bx), int(by)
        x2 = min(int(bx + bw), img_h)
        y2 = min(int(by + bh), img_h)
        img[y1:y2, x1:x2] = palette[int(lab)]
    noise = rng.integers(0, 8, size=img.shape, dtype=np.uint8)
    return (img - np.minimum(img, noise)).astype(np.uint8)


class InMemoryWebDataset(WebDataset):
    """WebDataset-compatible dataset backed by synthesized arrays."""

    def __init__(
        self,
        n_pages: int,
        img_h: int,
        seed: int = 0,
        min_boxes: int = 11,
        max_boxes: int = 230,
        n_additional_feat: int = 0,
    ):
        # Deliberately skip WebDataset.__init__ (no disk backing).
        self.root = "<memory>"
        self.img_h = img_h
        self.ids = [str(i) for i in range(n_pages)]
        self.all_boxes = []
        self.all_labels = []
        self.all_additional = []
        self._images: List[np.ndarray] = []
        for i in range(n_pages):
            rng = np.random.default_rng((seed, i))
            rec = synth_record(
                str(i), img_h, rng, min_boxes, max_boxes, n_additional_feat
            )
            self.all_boxes.append(rec.boxes_xywh)
            self.all_labels.append(rec.labels)
            self.all_additional.append(rec.additional_feats)
            self._images.append(synth_image(rec, img_h, rng))
        self.n_additional_feat = n_additional_feat

    def image(self, index: int) -> np.ndarray:
        return self._images[index]

    def subset(self, idxs) -> "InMemoryWebDataset":
        """A view-like dataset over the given page indices (split slicing
        for the synthetic CLI path) — lives here so the attribute list has
        exactly one owner (__init__)."""
        ds = InMemoryWebDataset.__new__(InMemoryWebDataset)
        ds.root = self.root
        ds.img_h = self.img_h
        ds.ids = [self.ids[i] for i in idxs]
        ds.all_boxes = [self.all_boxes[i] for i in idxs]
        ds.all_labels = [self.all_labels[i] for i in idxs]
        ds.all_additional = [self.all_additional[i] for i in idxs]
        ds._images = [self._images[i] for i in idxs]
        ds.n_additional_feat = self.n_additional_feat
        return ds


def materialize(
    out_dir: str,
    n_pages: int,
    img_h: int,
    seed: int = 0,
    min_boxes: int = 11,
    max_boxes: int = 230,
    n_additional_feat: int = 0,
) -> List[str]:
    """Write a synthetic dataset in the reference on-disk layout
    (imgs/<id>.png, bboxes/<id>.csv with header, optional
    additional_features/<id>.csv). Returns the page ids."""
    from PIL import Image

    os.makedirs(os.path.join(out_dir, "imgs"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "bboxes"), exist_ok=True)
    if n_additional_feat > 0:
        os.makedirs(
            os.path.join(out_dir, "additional_features"), exist_ok=True
        )
    ids = []
    for i in range(n_pages):
        rng = np.random.default_rng((seed, i))
        rec = synth_record(
            str(i), img_h, rng, min_boxes, max_boxes, n_additional_feat
        )
        img = synth_image(rec, img_h, rng)
        Image.fromarray(img).save(
            os.path.join(out_dir, "imgs", f"{rec.page_id}.png")
        )
        rows = np.concatenate(
            [rec.boxes_xywh, rec.labels[:, None].astype(np.float32)], axis=1
        )
        np.savetxt(
            os.path.join(out_dir, "bboxes", f"{rec.page_id}.csv"),
            rows,
            delimiter=",",
            header="x,y,w,h,label",
            comments="",
            fmt="%.2f",
        )
        if rec.additional_feats is not None:
            np.savetxt(
                os.path.join(
                    out_dir, "additional_features", f"{rec.page_id}.csv"
                ),
                rec.additional_feats,
                delimiter=",",
                header=",".join(
                    f"f{k}" for k in range(n_additional_feat)
                ),
                comments="",
                fmt="%.4f",
            )
        ids.append(rec.page_id)
    return ids
