"""Per-page prediction export — the standalone serving surface.

The reference has no "predict" entry point: its closest flows are
``evaluate.py`` (aggregate metrics only, needs ground-truth labels) and
``extract_attn_wts_and_visualize.py:89-156`` (per-box dumps, but only for
boxes whose *label* is non-background — useless when labels are unknown).
``cova predict`` closes that serving gap: point it at the standard on-disk
layout (``imgs/<id>.png`` + ``bboxes/<id>.csv``; the CSV's label column is
read for format compatibility but IGNORED — write 0 for unlabeled pages),
restore a trained fold checkpoint, and get one CSV per page with every
box's predicted class and the full softmax distribution.

Two artifacts:

* ``<out_dir>/<page_id>.csv`` — per-box rows (header included):
  ``x, y, w, h, pred, p_<class>...`` — bbox back in the reference's
  x/y/w/h convention (``/root/reference/datasets.py:114-115`` converts to
  xyxy internally, as we do), ``pred`` the argmax class id, then one
  calibrated probability column per class. Only valid (non-padding) boxes
  are written.
* ``<out_dir>/retrieval.csv`` — the task-level answer ("which box on the
  page IS the Price/Title/Image"): per page and non-BG class, the valid
  box with the highest class logit — exactly the ranking the reference's
  eval scores (``/root/reference/train.py:144-153``; ``steps.py``
  ``retrieval_metric`` at k=1). Rows:
  ``page_id, class, box_index, x, y, w, h, score`` where ``box_index`` is
  the box's position in the page's (sampled) DOM preorder and ``score``
  its softmax probability for that class.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from ..data.batching import bucket_batch, pad_batch
from ..utils.logging import _is_primary
from .steps import forward_step


def _softmax(logits: np.ndarray) -> np.ndarray:
    z = logits - logits.max(axis=-1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=-1, keepdims=True)


def predict_pages(
    state,
    pipeline,
    out_dir: str,
    class_names: Sequence[str],
    max_pages: Optional[int] = None,
    box_buckets: Sequence[int] = (),
    img_dir: Optional[str] = None,
) -> dict:
    """Run inference over every page in ``pipeline`` (an eval-style
    pipeline: no shuffle, sampling_fraction=1), writing
    ``<out_dir>/<page_id>.csv`` per page.

    ``img_dir``: when set (a directory of ``<page_id>.png`` screenshots),
    also render ``<out_dir>/<page_id>_pred.png`` — the page with its
    retrieval picks boxed and scored (``utils.visualize``).

    Returns a summary dict: ``pages``, ``boxes``, and per-class predicted
    box counts (keyed by class name).
    """
    # Eval-style pipelines are unsharded (every host reads the full page
    # list), so under multi-host only process 0 runs/writes — the others
    # would race the same files on a shared FS for identical content.
    if not _is_primary():
        s = {"pages": 0, "boxes": 0}
        s.update({c: 0 for c in class_names})
        return s
    os.makedirs(out_dir, exist_ok=True)
    eval_bs = pipeline.batch_size
    n_classes = len(class_names)
    header = "x,y,w,h,pred," + ",".join(f"p_{c}" for c in class_names)
    counts = np.zeros(n_classes, np.int64)
    retrieval_rows = []
    n_done = 0
    n_boxes = 0
    for ids, batch in pipeline.epoch(epoch=0):
        real_b = batch.batch_size
        padded, _ = pad_batch(batch, eval_bs)
        if box_buckets:
            # Same static-shape bucketing as the product eval path: the
            # jitted forward compiles once per bucket and all box-dim work
            # shrinks to the batch's real box count.
            padded = bucket_batch(padded, tuple(box_buckets))
        out = forward_step(state, padded)
        logits = np.asarray(out.logits, dtype=np.float32)  # [B, P', C]
        probs = _softmax(logits)
        preds = np.argmax(logits, axis=-1)
        p_used = logits.shape[1]
        for i in range(real_b):
            if max_pages is not None and n_done >= max_pages:
                return _finish(
                    out_dir, retrieval_rows, n_done, n_boxes, counts,
                    class_names,
                )
            mask = np.asarray(batch.box_mask[i][:p_used])
            xyxy = np.asarray(batch.boxes[i][:p_used])
            xywh = xyxy.copy()
            xywh[:, 2:] -= xywh[:, :2]
            rows = np.concatenate(
                [
                    xywh[mask],
                    preds[i][mask, None].astype(np.float32),
                    probs[i][mask],
                ],
                axis=1,
            )
            np.savetxt(
                os.path.join(out_dir, f"{ids[i]}.csv"),
                rows,
                delimiter=",",
                fmt=["%.4f"] * 4 + ["%d"] + ["%.4f"] * n_classes,
                header=header,
                comments="",
            )
            counts += np.bincount(preds[i][mask], minlength=n_classes)
            n_boxes += int(mask.sum())
            # Task-level retrieval pick (reference train.py:144-153, k=1):
            # per non-BG class, the valid box with the highest class logit.
            col = np.where(mask[:, None], logits[i], -np.inf)  # [P', C]
            picks = []
            if mask.any():
                for c in range(1, n_classes):
                    j = int(np.argmax(col[:, c]))
                    picks.append((
                        class_names[c],
                        *(float(v) for v in xywh[j]),
                        float(probs[i][j, c]),
                    ))
                    retrieval_rows.append(
                        f"{ids[i]},{class_names[c]},{j},"
                        + ",".join(f"{v:.4f}" for v in xywh[j])
                        + f",{probs[i][j, c]:.4f}"
                    )
            if img_dir is not None and picks:
                from ..utils.visualize import visualize_predictions

                visualize_predictions(
                    os.path.join(img_dir, f"{ids[i]}.png"),
                    picks,
                    os.path.join(out_dir, f"{ids[i]}_pred.png"),
                )
            n_done += 1
    return _finish(
        out_dir, retrieval_rows, n_done, n_boxes, counts, class_names
    )


def _finish(out_dir, retrieval_rows, pages, boxes, counts, class_names):
    with open(os.path.join(out_dir, "retrieval.csv"), "w") as f:
        f.write("page_id,class,box_index,x,y,w,h,score\n")
        f.write("".join(r + "\n" for r in retrieval_rows))
    s = {"pages": int(pages), "boxes": int(boxes)}
    s.update({c: int(n) for c, n in zip(class_names, counts)})
    return s
