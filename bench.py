#!/usr/bin/env python
"""Driver benchmark: flagship CoVA train step throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pages/s", "vs_baseline": N}

vs_baseline is measured against the PyTorch-CPU reference implementation
(see scripts/bench_torch_baseline.py and baseline_torch.json; the reference
repo publishes no throughput numbers of its own).

Fault tolerance: the remote-TPU tunnel occasionally throws a transient
``INTERNAL: TPU backend error`` at compile/warmup (it did exactly that in
round 1's capture). A wedged backend is not recoverable in-process, so the
measurement runs in a worker subprocess and the parent retries with a fresh
interpreter (fresh backend/tunnel connection) up to COVA_BENCH_ATTEMPTS
times, emitting the first successful JSON line.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_WORKER_FLAG = "--worker"


def _run_worker():
    # Persistent compile cache, HOST-KEYED (utils/hostfp.py) and shared
    # with scripts/tpu_battery.sh's location: the B=64 flagship fori-loop
    # step costs ~10 min of XLA compile through the remote tunnel; a warm
    # cache turns a repeat bench run into ~1 min.
    from cova_tpu.utils.hostfp import ensure_default_compile_cache

    ensure_default_compile_cache()

    from cova_tpu.benchmarks import run_train_bench

    result = run_train_bench(
        # Per-chip throughput is reported at the best measured batch
        # (B=64 — fixed per-step costs amortize; r4 battery measured
        # 285.5 at B=64 vs 278.9 at B=32 vs 273.4 at B=8); vs_baseline
        # stays fair because both sides are per-page. COVA_BENCH_BATCH
        # overrides. NOTE: the baseline anchor is a 1-core torch-CPU
        # measurement (baseline_torch.json cpu_count: 1) — vs_baseline
        # is honest JSON but quotes a single-core CPU, not a GPU.
        batch_size=int(os.environ.get("COVA_BENCH_BATCH", "64")),
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


def _parse_json_line(stdout: str):
    """Last stdout line that parses as the bench JSON object, or None."""
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(obj, dict) and "metric" in obj and "value" in obj:
            return line
    return None


def main():
    attempts = int(os.environ.get("COVA_BENCH_ATTEMPTS", "3"))
    last_output = ""
    for attempt in range(1, attempts + 1):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), _WORKER_FLAG],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
                # Remote-tunnel compile latency is highly variable: the
                # same full-step compile has measured 69 s and 2211 s in
                # one session. Budget for the slow tail.
                timeout=int(os.environ.get("COVA_BENCH_TIMEOUT", "3000")),
            )
            last_output = proc.stdout + "\n" + proc.stderr
            line = _parse_json_line(proc.stdout)
            if proc.returncode == 0 and line is not None:
                print(line)
                return 0
        except subprocess.TimeoutExpired as e:
            last_output = f"attempt {attempt} timed out: {e}"
        sys.stderr.write(
            f"[bench.py] attempt {attempt}/{attempts} failed; "
            f"{'retrying with a fresh backend' if attempt < attempts else 'giving up'}\n"
        )
        if attempt < attempts:
            time.sleep(5 * attempt)
    sys.stderr.write(last_output[-4000:] + "\n")
    return 1


if __name__ == "__main__":
    if _WORKER_FLAG in sys.argv:
        _run_worker()
    else:
        sys.exit(main())
