#!/bin/bash
# Round-3 on-chip measurement battery. Run when the TPU tunnel is up.
# Each step appends its tail to artifacts/tpu_r3/; safe to re-run.
set -u
cd "$(dirname "$0")/.."
OUT=artifacts/tpu_r3
mkdir -p "$OUT"

run() { # name cmd...
  local name=$1; shift
  echo "=== $name: $* ==="
  # tail -10 keeps every line bench_roi_pool prints (6: mix/roi_fwd
  # header, cb header, 2x compile, 2x ms/iter) plus slack.
  timeout 6000 "$@" 2>"$OUT/$name.err" | tail -10 | tee "$OUT/$name.out"
  # tee always exits 0 — report the measured command's status.
  echo "rc=${PIPESTATUS[0]} done $name"
}

# Persistent compilation cache: remote-tunnel compiles have measured
# 69-2211 s; if the PJRT plugin supports executable serialization this
# makes every re-run warm (harmless no-op otherwise).
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cc}
# bench.py's internal retry must fit inside run()'s outer timeout:
# 2 attempts x 2700 s + slack < 6000 s (default was 3 x 3000, which the
# old outer timeout 3000 killed before any retry could run).
export COVA_BENCH_ATTEMPTS=${COVA_BENCH_ATTEMPTS:-2}
export COVA_BENCH_TIMEOUT=${COVA_BENCH_TIMEOUT:-2700}

run bench        python bench.py
# Full-dict runs (step_ms, batch, device in the JSON) via the CLI bench:
run train_b8     python -m cova_tpu.cli bench --mode train -bsb 8
run train_b64    python -m cova_tpu.cli bench --mode train -bsb 64
run infer_b32    python -m cova_tpu.cli bench --mode infer -bsb 32
run infer_b1     python -m cova_tpu.cli bench --mode infer -bsb 1
run e2e_disk     python -m cova_tpu.cli bench --mode e2e --e2e_source disk -bsb 8
run eval_chunk   python scripts/measure_eval_chunk.py --pages 40
# RoIPool ranged-forward A/B (chunk-max pyramid, COVA_ROI_FWD=ranged):
# walk vs ranged on the small mix, an approximated real DOM mix, and the
# all-tall best case; plus the whole-step bench both ways.
run roi_small_walk    python scripts/bench_roi_pool.py 8 64 320 small
run roi_small_ranged  env COVA_ROI_FWD=ranged python scripts/bench_roi_pool.py 8 64 320 small
run roi_real_walk     python scripts/bench_roi_pool.py 8 64 320 real
run roi_real_ranged   env COVA_ROI_FWD=ranged python scripts/bench_roi_pool.py 8 64 320 real
run roi_tall_walk     python scripts/bench_roi_pool.py 8 64 320 tall
run roi_tall_ranged   env COVA_ROI_FWD=ranged python scripts/bench_roi_pool.py 8 64 320 tall
run bench_ranged      env COVA_ROI_FWD=ranged python bench.py
run infer_ranged      env COVA_ROI_FWD=ranged python -m cova_tpu.cli bench --mode infer -bsb 32
# Stretch config (2560px, B=2): round-2 measured 78.0 ms/step before the
# W-packed layer1 landed — re-measure post-packing (CLI bench: step_ms
# lands in the JSON).
run stretch           python -m cova_tpu.cli bench --mode train -bsb 2 --img_height 2560

python scripts/summarize_battery.py "$OUT" | tee "$OUT/SUMMARY.txt"
