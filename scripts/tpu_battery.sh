#!/bin/bash
# Round-3 on-chip measurement battery. Run when the TPU tunnel is up.
# Each step appends one JSON/log line to artifacts/tpu_r3/; safe to re-run.
set -u
cd "$(dirname "$0")/.."
OUT=artifacts/tpu_r3
mkdir -p "$OUT"

run() { # name cmd...
  local name=$1; shift
  echo "=== $name: $* ==="
  timeout 3000 "$@" 2>"$OUT/$name.err" | tail -5 | tee "$OUT/$name.out"
  # tee always exits 0 — report the measured command's status.
  echo "rc=${PIPESTATUS[0]} done $name"
}

# Persistent compilation cache: remote-tunnel compiles have measured
# 69-2211 s; if the PJRT plugin supports executable serialization this
# makes every re-run warm (harmless no-op otherwise).
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cc}

run bench        python bench.py
run train_b8     env COVA_BENCH_BATCH=8 python bench.py
run train_b64    env COVA_BENCH_BATCH=64 python bench.py
run infer_b32    python -m cova_tpu.cli bench --mode infer --batch_size_bench 32
run infer_b1     python -m cova_tpu.cli bench --mode infer --batch_size_bench 1
run e2e_disk     python -m cova_tpu.cli bench --mode e2e --e2e_source disk --batch_size_bench 8
run eval_chunk   python scripts/measure_eval_chunk.py --pages 40
# RoIPool ranged-forward A/B (chunk-max pyramid, COVA_ROI_FWD=ranged):
# walk vs ranged on the historical small mix, an approximated real DOM
# mix, and the all-tall best case; plus the whole-step bench both ways.
run roi_small_walk    python scripts/bench_roi_pool.py 8 64 320 small
run roi_small_ranged  env COVA_ROI_FWD=ranged python scripts/bench_roi_pool.py 8 64 320 small
run roi_real_walk     python scripts/bench_roi_pool.py 8 64 320 real
run roi_real_ranged   env COVA_ROI_FWD=ranged python scripts/bench_roi_pool.py 8 64 320 real
run roi_tall_walk     python scripts/bench_roi_pool.py 8 64 320 tall
run roi_tall_ranged   env COVA_ROI_FWD=ranged python scripts/bench_roi_pool.py 8 64 320 tall
run bench_ranged      env COVA_ROI_FWD=ranged python bench.py
run infer_ranged      env COVA_ROI_FWD=ranged python -m cova_tpu.cli bench --mode infer --batch_size_bench 32
# Stretch config (2560px, B=2): round-2 measured 78.0 ms/step before the
# W-packed layer1 landed — re-measure post-packing.
run stretch           env COVA_BENCH_IMG=2560 COVA_BENCH_BATCH=2 python bench.py

python scripts/summarize_battery.py "$OUT" | tee "$OUT/SUMMARY.txt"
