"""Measure the decoded-screenshot cache (data/decode_cache.py).

Times host-pipeline epochs over a DISK-BACKED synthetic dataset at flagship
geometry (1280^2 PNGs through the native libpng pool) in three modes:
uncached, cache-cold (decode + persist), cache-warm (memmap hits only).
No device work — this isolates the host side, which is the real-data
bottleneck on small hosts (ROADMAP: ~16 cores of decode match one chip).

Usage: python scripts/measure_decode_cache.py [--pages 24] [--img 1280]
"""

import argparse
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=24)
    ap.add_argument("--img", type=int, default=1280)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--threads", type=int, default=0)
    args = ap.parse_args()

    import os

    from cova_tpu.data.dataset import WebDataset
    from cova_tpu.data.pipeline import DataPipeline
    from cova_tpu.data.synthetic import materialize

    threads = args.threads or min(8, os.cpu_count() or 1)
    tmp = tempfile.mkdtemp(prefix="cova_cache_bench_")
    try:
        data = f"{tmp}/data"
        ids = materialize(data, args.pages, args.img, seed=7,
                          min_boxes=60, max_boxes=120)

        def epoch_time(ds):
            pipe = DataPipeline(ds, batch_size=args.batch, pad_boxes=232,
                                context_size=12, shuffle=False,
                                num_threads=threads)
            t0 = time.time()
            n = 0
            for _ids, batch in pipe.epoch(0):
                n += batch.batch_size
            return time.time() - t0, n

        plain = WebDataset(data, ids, img_size=args.img)
        t_plain, n = epoch_time(plain)

        cached = WebDataset(data, ids, img_size=args.img,
                            decode_cache_dir=f"{tmp}/cache")
        t_cold, _ = epoch_time(cached)
        t_warm, _ = epoch_time(cached)
        t_warm2, _ = epoch_time(cached)

        print(json.dumps({
            "pages": n, "img": args.img, "threads": threads,
            "uncached_s": round(t_plain, 2),
            "cold_s": round(t_cold, 2),
            "warm_s": round(min(t_warm, t_warm2), 2),
            "uncached_pages_per_s": round(n / t_plain, 1),
            "warm_pages_per_s": round(n / min(t_warm, t_warm2), 1),
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
