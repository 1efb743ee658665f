"""Attention-weight extraction + visualization export.

Capability parity with ``extract_attn_wts_and_visualize.py``
(``/root/reference/extract_attn_wts_and_visualize.py:89-156``): for every
test page, dump one CSV whose rows are the page's non-BG boxes with layout
``[4 bbox coords (x,y,w,h), label, 2K*4 context bbox coords, 2K attention
weights]`` (fmt %.3f, documented at reference ``:162-164``), then render the
overlay PNGs.

The reference must re-run model internals manually to reach the attention
weights (``:117-124``); here the fused forward always returns them
(``models/cova.py``), so extraction is a plain eval pass.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..data.batching import pad_batch
from ..utils.logging import _is_primary
from .steps import forward_step


def _context_coords(boxes_xywh: np.ndarray, ctx: np.ndarray) -> np.ndarray:
    """Gather [x, y, w, h] of each context slot; -1 -> zeros (the reference's
    zero-row padding trick, ``extract...py:111-115``).

    boxes_xywh: [P, 4]; ctx: [P, K]. Returns [P, K*4].
    """
    padded = np.concatenate(
        [boxes_xywh, np.zeros((1, 4), boxes_xywh.dtype)], 0
    )
    return padded[ctx.reshape(-1)].reshape(ctx.shape[0], -1)


def extract_attention(
    state,
    pipeline,
    data_dir: str,
    out_dir: str,
    visualize: bool = True,
    max_pages: Optional[int] = None,
):
    """Run the test split, writing per-page attention CSVs (and overlays)."""
    # Eval-style pipelines are unsharded; under multi-host only process 0
    # writes — others would race the same CSV/PNG paths on a shared FS
    # (same guard as predict_pages / reporting.evaluate).
    if not _is_primary():
        return
    os.makedirs(out_dir, exist_ok=True)
    eval_bs = pipeline.batch_size
    n_done = 0

    def done():
        # The reference always announces the output dir + CSV layout
        # (extract_attn_wts_and_visualize.py:158-164), including when the
        # run is capped.
        print(
            "Extracted attention visualizations and weights for "
            f"{n_done} images saved in {out_dir}"
        )
        print(
            "CSV row layout: [4 bbox coords (x,y,w,h), label, "
            "2K*4 context bbox coords, 2K attention weights]"
        )

    for ids, batch in pipeline.epoch(epoch=0):
        real_b = batch.batch_size
        padded, _ = pad_batch(batch, eval_bs)
        out = forward_step(state, padded)
        attn = np.asarray(out.attn_wts)  # [B, P, K]
        for i in range(real_b):
            if max_pages is not None and n_done >= max_pages:
                return done()
            page_id = ids[i]
            mask = np.asarray(batch.box_mask[i])
            labels = np.asarray(batch.labels[i])
            xyxy = np.asarray(batch.boxes[i])
            xywh = xyxy.copy()
            xywh[:, 2:] -= xywh[:, :2]
            ctx = np.asarray(batch.context_indices[i])
            ctx_coords = _context_coords(xywh, ctx)

            keep = (labels > 0) & mask
            rows = np.concatenate(
                [
                    xywh[keep],
                    labels[keep, None].astype(np.float32),
                    ctx_coords[keep],
                    attn[i][keep],
                ],
                axis=1,
            )
            csv_path = os.path.join(out_dir, f"{page_id}.csv")
            np.savetxt(csv_path, rows, delimiter=",", fmt="%.3f")

            if visualize:
                from ..utils.visualize import visualize_bbox

                visualize_bbox(
                    os.path.join(data_dir, "imgs", f"{page_id}.png"),
                    csv_path,
                    out_dir,
                )
            n_done += 1
    done()
