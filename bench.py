#!/usr/bin/env python
"""Driver benchmark: flagship CoVA train step throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pages/s", "vs_baseline": N}

vs_baseline is measured against the PyTorch-CPU reference implementation
(see scripts/bench_torch_baseline.py and baseline_torch.json; the reference
repo publishes no throughput numbers of its own).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    from cova_tpu.benchmarks import run_train_bench

    result = run_train_bench(
        batch_size=int(os.environ.get("COVA_BENCH_BATCH", "8")),
        steps=int(os.environ.get("COVA_BENCH_STEPS", "20")),
        img_height=int(os.environ.get("COVA_BENCH_IMG", "1280")),
    )
    print(
        json.dumps(
            {
                "metric": result["metric"],
                "value": result["value"],
                "unit": result["unit"],
                "vs_baseline": result["vs_baseline"],
            }
        )
    )


if __name__ == "__main__":
    main()
