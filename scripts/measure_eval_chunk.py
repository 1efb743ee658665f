"""Measure the chunked-eval host-copy tradeoff (run_eval's COVA_EVAL_CHUNK).

``run_eval`` groups G eval batches per jitted dispatch: fewer dispatch
round-trips (a win through a high-latency device tunnel) at the cost of
re-stacking G whole uint8 batches on host before one device_put (a loss
on a local-PCIe/CPU backend where dispatch is cheap). This script times a
full eval epoch at chunk=1 vs chunk=8 on the current backend and prints
one JSON line per setting; run it on both backends to pick the default.

Usage:
  python scripts/measure_eval_chunk.py                 # current backend
  JAX_PLATFORMS=cpu python scripts/measure_eval_chunk.py --img_height 320
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img_height", type=int, default=1280)
    ap.add_argument("--pages", type=int, default=60)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import cova_tpu.train.trainer as trainer_mod
    from cova_tpu.config import Config
    from cova_tpu.data.pipeline import make_pipelines
    from cova_tpu.data.synthetic import InMemoryWebDataset
    from cova_tpu.models.cova import build_model
    from cova_tpu.train.steps import create_train_state
    from cova_tpu.data.batching import pad_batch

    cfg = Config(img_height=args.img_height, compute_dtype="bfloat16")
    ds = InMemoryWebDataset(args.pages, cfg.img_height, seed=3,
                            max_boxes=cfg.max_boxes)
    _, va, _ = make_pipelines(cfg, ds, ds, ds)
    model = build_model(cfg)
    _, ex = next(iter(va.epoch(0)))
    ex, _ = pad_batch(ex, va.batch_size)
    state = create_train_state(model, cfg, ex, jax.random.PRNGKey(0))

    results = {}
    for chunk in (1, 8):
        os.environ["COVA_EVAL_CHUNK"] = str(chunk)
        # warmup compile
        buckets = tuple(cfg.box_buckets)  # what the product dispatches
        trainer_mod.run_eval(state, va, cfg.n_classes,
                             ("BG", "Price", "Title", "Image"), "WARM",
                             box_buckets=buckets)
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            trainer_mod.run_eval(state, va, cfg.n_classes,
                                 ("BG", "Price", "Title", "Image"), "MEAS",
                                 box_buckets=buckets)
            times.append(time.time() - t0)
        results[f"chunk{chunk}_s"] = round(min(times), 3)

    out = {
        "backend": jax.devices()[0].platform,
        "img_height": args.img_height,
        "pages": args.pages,
        **results,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
