#!/usr/bin/env python
"""Synthesize a corpus-scale dataset CLONE keyed to the verbatim splits/
tree (VERDICT r4 item 1).

The real dataset is external and unreachable (``/root/reference/
constants.py:3`` points at ``../data/``; no egress), but the protocol
artifacts ARE in-repo: ``splits/all_imgs.txt`` (7,740 page ids),
``splits/webpage_info.csv`` (408 domains), ``splits/Fold-{1..5}/`` file
lists. This script writes one hard-mode synthetic page per REAL page id in
the reference's on-disk layout (imgs/<id>.png + bboxes/<id>.csv), so
``cova train --data_dir <clone> -cvf k`` drives the verbatim fold protocol
end-to-end at true corpus scale: fold loading (main.py:36-51), disjointness
asserts, 408-domain macro reporting (evaluate.py:47-78), decode cache, and
epoch pacing.

Box-count distribution follows the published stats (``splits/
bbox_stats.txt``: min 11 / max 230 / mean 93 / std 37) via a clipped
normal draw, so padding-bucket behavior and epoch cost match the real
corpus shape, not a uniform stand-in.

A sidecar ``corpus_oracle.csv`` records the Bayes-oracle ceiling band per
page (latent + visible, see cova_tpu/data/synthetic.py) while the latents
are still in hand — fold-level test-split oracle accuracy is then a plain
per-fold mean over its test ids.

Usage:
  python scripts/make_corpus_clone.py --out /root/corpus_clone \
      --img_height 512 [--seed 123] [--limit N] [--no-oracle]
"""

import argparse
import csv
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cova_tpu.data.synthetic import (  # noqa: E402
    _box_colors,
    colors_from_image,
    oracle_scores,
    synth_image,
    synth_record,
)

BBOX_MIN, BBOX_MAX, BBOX_MEAN, BBOX_STD = 11, 230, 93.0, 37.3


def n_boxes_for(rng: np.random.Generator) -> int:
    """Clipped-normal box count matching splits/bbox_stats.txt."""
    return int(np.clip(round(rng.normal(BBOX_MEAN, BBOX_STD)),
                       BBOX_MIN, BBOX_MAX))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--img_height", type=int, default=512)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--limit", type=int, default=0,
                    help="only the first N ids (smoke runs)")
    ap.add_argument("--no-oracle", action="store_true")
    ap.add_argument("--splits", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "splits"))
    args = ap.parse_args()

    ids = np.loadtxt(os.path.join(args.splits, "all_imgs.txt"), str)
    if args.limit:
        ids = ids[: args.limit]
    os.makedirs(os.path.join(args.out, "imgs"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "bboxes"), exist_ok=True)

    from PIL import Image

    oracle_rows = []
    t0 = time.perf_counter()
    for k, pid in enumerate(ids):
        png = os.path.join(args.out, "imgs", f"{pid}.png")
        csv_path = os.path.join(args.out, "bboxes", f"{pid}.csv")
        # Keyed by (seed, page id): re-runs and partial runs are
        # reproducible per page, independent of iteration order.
        rng = np.random.default_rng((args.seed, int(pid)))
        n = n_boxes_for(rng)
        rec = synth_record(pid, args.img_height, rng,
                           min_boxes=n, max_boxes=n, hard=True)
        colors = _box_colors(rec, args.img_height, rng, hard=True)
        img = synth_image(rec, args.img_height, rng, hard=True,
                          colors=colors)
        if not (os.path.isfile(png) and os.path.isfile(csv_path)):
            Image.fromarray(img).save(png)
            rows = np.concatenate(
                [rec.boxes_xywh,
                 rec.labels[:, None].astype(np.float32)], axis=1)
            np.savetxt(csv_path, rows, delimiter=",",
                       header="x,y,w,h,label", comments="", fmt="%.2f")
        if not args.no_oracle:
            accs = []
            for visible in (False, True):
                if visible:
                    cols, tol = colors_from_image(img, rec.boxes_xywh), 8
                else:
                    cols, tol = colors, 0
                s = oracle_scores(rec.boxes_xywh, cols, args.img_height,
                                  color_tol=tol)
                for c in (1, 2, 3):
                    true_idx = int(np.argmax(rec.labels == c))
                    accs.append(int(np.argmax(s[:, c - 1]) == true_idx))
            oracle_rows.append([pid] + accs)
        if (k + 1) % 250 == 0:
            rate = (k + 1) / (time.perf_counter() - t0)
            print(f"{k + 1}/{len(ids)} pages ({rate:.1f}/s)", flush=True)

    if oracle_rows:
        with open(os.path.join(args.out, "corpus_oracle.csv"), "w",
                  newline="") as f:
            w = csv.writer(f)
            w.writerow(["page_id",
                        "price_latent", "title_latent", "image_latent",
                        "price_visible", "title_visible", "image_visible"])
            w.writerows(oracle_rows)
        arr = np.array([r[1:] for r in oracle_rows], dtype=np.float64)
        m = arr.mean(axis=0) * 100
        print("oracle latent  P %.1f T %.1f I %.1f" % (m[0], m[1], m[2]))
        print("oracle visible P %.1f T %.1f I %.1f" % (m[3], m[4], m[5]))
    dt = time.perf_counter() - t0
    print(f"done: {len(ids)} pages in {dt:.0f}s -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
