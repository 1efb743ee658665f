#!/bin/bash
# Round-5 battery remainder, REPRIORITIZED (2026-08-20): the tunnel is
# compiling 2-14x slower than round 4 (roi_small cold compile 830 s vs the
# 69-2211 s historical band's low end), so the original tpu_battery.sh order
# would burn the remaining wall clock on roi drift checks before reaching
# the VERDICT-critical steps. Order here: new-evidence steps first
# (roi_onchip numerics of the round-5 default edge-rows kernels;
# stretch_full = BASELINE configs[4] AS DEFINED), drift re-measurements
# last. The edge-treatment A/B on all three mixes was already captured
# this round in artifacts/tpu_r5/roi_edge_ab.out.
set -u
cd "$(dirname "$0")/.."
OUT=artifacts/tpu_r5
mkdir -p "$OUT"

run() { # name cmd...
  local name=$1; shift
  echo "=== $name: $* ==="
  timeout 6000 "$@" 2>"$OUT/$name.err" | tail -10 | tee "$OUT/$name.out"
  echo "rc=${PIPESTATUS[0]} done $name"
}

_cc=$(python -c "from cova_tpu.utils.hostfp import ensure_default_compile_cache as e; \
import sys; p=e(); print(p) if p else sys.exit(1)") || _cc=""
if [ -n "$_cc" ]; then
  export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$_cc}
fi
export COVA_BENCH_ATTEMPTS=${COVA_BENCH_ATTEMPTS:-2}
export COVA_BENCH_TIMEOUT=${COVA_BENCH_TIMEOUT:-2700}

# --- new-evidence steps (round-5 defaults / VERDICT r4 items) ---
run roi_onchip        python scripts/check_roi_onchip.py
run stretch_full      python -m cova_tpu.cli bench --mode train -bsb 2 --img_height 2560 --backbone resnet50 -cs 24
run stretch           python -m cova_tpu.cli bench --mode train -bsb 2 --img_height 2560
run bench_af          python -m cova_tpu.cli bench --mode train -bsb 8 --use_additional_feat
run parity_flagship   python scripts/parity_flagship.py 2
# --- drift re-measurements (round-4 equivalents exist) ---
run roi_real          python scripts/bench_roi_pool.py 8 64 320 real
run roi_real_eslab    env COVA_ROI_EDGE=slab python scripts/bench_roi_pool.py 8 64 320 real
run roi_tall          python scripts/bench_roi_pool.py 8 64 320 tall
run roi_tall_eslab    env COVA_ROI_EDGE=slab python scripts/bench_roi_pool.py 8 64 320 tall
run roi_real_bwalk    env COVA_ROI_BWD=walk python scripts/bench_roi_pool.py 8 64 320 real
run roi_real_fwalk    env COVA_ROI_FWD=walk python scripts/bench_roi_pool.py 8 64 320 real

python scripts/summarize_battery.py "$OUT" | tee "$OUT/SUMMARY.txt"
