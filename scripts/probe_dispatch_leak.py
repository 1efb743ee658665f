#!/usr/bin/env python
"""Isolate the slow-epoch / RSS-growth source seen in corpus-scale runs.

Two phases, same jitted flagship-shaped train step:
  A) REUSED batch: step N times on one device-resident batch — any RSS
     growth here is dispatch-side (outputs/donation bookkeeping).
  B) FRESH batch each step: device_put a new host batch per step (the
     training-loop pattern) — growth here beyond (A) is transfer-side
     (host mirrors / PJRT buffer table entries that outlive the step).

Prints RSS and live-array counts every `--every` steps. Run on the chip
between battery steps; compare slopes. (The corpus fold runs showed
~+10 s/epoch and ~1 GB/epoch on the axon tunnel — this tells whether the
framework or the plugin owns it.)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--every", type=int, default=50)
    ap.add_argument("--img_height", type=int, default=512)
    ap.add_argument("--batch_size", type=int, default=5)
    args = ap.parse_args()

    import jax
    import numpy as np

    from cova_tpu.config import Config
    from cova_tpu.data.batching import bucket_batch, collate
    from cova_tpu.data.records import pad_page
    from cova_tpu.data.synthetic import synth_image, synth_record
    from cova_tpu.models.cova import build_model
    from cova_tpu.train.steps import create_train_state, train_step

    cfg = Config(batch_size=args.batch_size, img_height=args.img_height)
    model = build_model(cfg)
    imgs, pages = [], []
    for i in range(args.batch_size):
        r = np.random.default_rng((7, i))
        rec = synth_record(str(i), args.img_height, r, min_boxes=60,
                           max_boxes=min(120, cfg.max_boxes))
        imgs.append(synth_image(rec, args.img_height, r))
        pages.append(pad_page(rec, cfg.pad_boxes, cfg.context_size))
    host_batch = bucket_batch(collate(imgs, pages), cfg.box_buckets)
    batch = jax.device_put(host_batch)
    state = create_train_state(model, cfg, batch, jax.random.PRNGKey(0))
    step = train_step  # already jitted with donated state (train/steps.py)
    rng = jax.random.PRNGKey(0)

    def run(phase: str, fresh: bool):
        nonlocal state
        t0 = time.perf_counter()
        r0 = rss_mb()
        for i in range(args.steps):
            b = batch
            if fresh:
                b = jax.tree.map(jax.device_put, host_batch)
            state, m = step(state, b, rng)
            if (i + 1) % args.every == 0:
                jax.block_until_ready(m)
                dt = time.perf_counter() - t0
                print(
                    f"{phase} step {i+1:4d}  rss {rss_mb():8.1f} MB "
                    f"(+{rss_mb()-r0:7.1f})  live_arrays "
                    f"{len(jax.live_arrays()):5d}  {dt/args.every*1e3:6.1f} "
                    "ms/step",
                    flush=True,
                )
                t0 = time.perf_counter()

    run("A reused", fresh=False)
    run("B fresh ", fresh=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
