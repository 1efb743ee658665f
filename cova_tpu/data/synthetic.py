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
    hard: bool = False,
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
    if hard:
        # Hard mode (VERDICT r3 weak 5): class-box GEOMETRY follows soft
        # layout priors instead of being uniform — the color channel alone
        # no longer identifies the class (synth_image draws color-matched
        # distractors), so the model must combine appearance with the bbox
        # positional features to beat them, and the priors are noisy
        # enough that Bayes accuracy is below 100%.
        ih = float(img_h)
        # Title: wide, short, near the top.
        boxes[pos[1]] = [
            rng.uniform(0.05, 0.3) * ih, rng.uniform(0.0, 0.25) * ih,
            rng.uniform(0.3, 0.6) * ih, rng.uniform(0.03, 0.08) * ih,
        ]
        # Price: small, mid-page.
        boxes[pos[0]] = [
            rng.uniform(0.1, 0.8) * ih, rng.uniform(0.25, 0.6) * ih,
            rng.uniform(0.04, 0.12) * ih, rng.uniform(0.02, 0.06) * ih,
        ]
        # Image: large and square-ish, upper half.
        side = rng.uniform(0.25, 0.45) * ih
        boxes[pos[2]] = [
            rng.uniform(0.0, 0.5) * ih, rng.uniform(0.0, 0.35) * ih,
            side * rng.uniform(0.85, 1.15), side,
        ]
        # Keep the module-wide w,h >= 2 px invariant: the priors scale
        # with img_h, so at small smoke geometries (e.g. 64 px) the
        # Price height draw uniform(0.02, 0.06)*ih can land below 2 px —
        # sub-pixel after the stride-4 backbone, collapsing Price
        # accuracy toward chance for reasons unrelated to task hardness.
        boxes[pos, 2:] = np.maximum(boxes[pos, 2:], 2.0)
        np.clip(boxes[:, :2], 0, ih - 4, out=boxes[:, :2])
        boxes[:, 2] = np.minimum(boxes[:, 2], ih - boxes[:, 0])
        boxes[:, 3] = np.minimum(boxes[:, 3], ih - boxes[:, 1])
    feats = None
    if n_additional_feat > 0:
        feats = rng.normal(size=(n, n_additional_feat)).astype(np.float32)
    return PageRecord(page_id, boxes, labels, feats)


def synth_image(
    record: PageRecord, img_h: int, rng: np.random.Generator,
    hard: bool = False,
) -> np.ndarray:
    """Screenshot-like uint8 image: light background, boxes drawn as blocks
    whose fill encodes their class (so a model can actually learn).

    ``hard=True`` (VERDICT r3 weak 5 — the easy task saturates at ~100%
    and hides regressions): class colors are jittered AND ~15% of BG boxes
    are DISTRACTORS drawn from the same jittered class palettes, so color
    alone cannot identify the true box — the model must combine it with
    the layout priors ``synth_record(hard=True)`` gives the class boxes.
    Sweep accuracies land mid-80s to mid-90s instead of ~100 (measured;
    see artifacts/sweep_r4), making a 2-3 point regression visible."""
    img = np.full((img_h, img_h, 3), 245, dtype=np.uint8)
    palette = {
        0: np.array([200, 200, 200], np.uint8),
        1: np.array([220, 40, 40], np.uint8),  # Price: red-ish
        2: np.array([40, 40, 220], np.uint8),  # Title: blue-ish
        3: np.array([40, 220, 40], np.uint8),  # Image: green-ish
    }
    # BG boxes first, target boxes last, so a random BG box cannot paint
    # over a Price/Title/Image box and destroy the visual signal. In hard
    # mode the large Image box could blanket Price/Title, so class boxes
    # additionally draw in area-DESCENDING order (small ones on top — the
    # same occlusion rule a DOM's paint order gives children).
    is_cls = record.labels != 0
    if hard:
        area = record.boxes_xywh[:, 2] * record.boxes_xywh[:, 3]
        order = np.lexsort((-area * is_cls, is_cls))
    else:
        order = np.argsort(is_cls, kind="stable")
    for (bx, by, bw, bh), lab in zip(
        record.boxes_xywh[order], record.labels[order]
    ):
        x1, y1 = int(bx), int(by)
        x2 = min(int(bx + bw), img_h)
        y2 = min(int(by + bh), img_h)
        color = palette[int(lab)]
        if hard:
            if lab == 0 and rng.uniform() < 0.15:
                # Color-matched distractor: same jitter distribution as
                # the true class boxes below.
                color = palette[int(rng.integers(1, 4))]
            if not np.array_equal(color, palette[0]):
                jit = rng.integers(-40, 41, size=3)
                color = np.clip(
                    color.astype(np.int32) + jit, 0, 255
                ).astype(np.uint8)
        img[y1:y2, x1:x2] = color
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
        hard: bool = False,
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
                str(i), img_h, rng, min_boxes, max_boxes,
                n_additional_feat, hard=hard,
            )
            self.all_boxes.append(rec.boxes_xywh)
            self.all_labels.append(rec.labels)
            self.all_additional.append(rec.additional_feats)
            self._images.append(synth_image(rec, img_h, rng, hard=hard))
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
    hard: bool = False,
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
            str(i), img_h, rng, min_boxes, max_boxes,
            n_additional_feat, hard=hard,
        )
        img = synth_image(rec, img_h, rng, hard=hard)
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
