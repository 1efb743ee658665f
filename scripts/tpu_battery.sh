#!/bin/bash
# Round-5 on-chip measurement battery. Run when the TPU tunnel is up.
# Each step appends its tail to artifacts/tpu_r5/; safe to re-run.
set -u
cd "$(dirname "$0")/.."
OUT=artifacts/tpu_r5
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
# Host-keyed cache dir (utils/hostfp.py): avoids XLA's cross-machine
# feature-mismatch hazard, and lives under $HOME (0700) so no other local
# user can pre-seed executables (see ensure_default_compile_cache).
# (cwd is the repo root after the cd above; python -c adds cwd to sys.path)
_cc=$(python -c "from cova_tpu.utils.hostfp import ensure_default_compile_cache as e; \
import sys; p=e(); print(p) if p else sys.exit(1)") || _cc=""
if [ -n "$_cc" ]; then
  export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$_cc}
else
  echo "WARN: compile cache unavailable; runs will compile cold" >&2
fi
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
# RoIPool A/Bs. Round-5 defaults are fwd=ranged(slab edges) +
# bwd=pyramid(row edges); measure the edge treatment (COVA_ROI_EDGE, r5
# lever) on all three mixes, and keep one bwd walk + fwd walk pair for
# drift.
run roi_small         python scripts/bench_roi_pool.py 8 64 320 small
run roi_small_eslab   env COVA_ROI_EDGE=slab python scripts/bench_roi_pool.py 8 64 320 small
run roi_real          python scripts/bench_roi_pool.py 8 64 320 real
run roi_real_eslab    env COVA_ROI_EDGE=slab python scripts/bench_roi_pool.py 8 64 320 real
run roi_tall          python scripts/bench_roi_pool.py 8 64 320 tall
run roi_tall_eslab    env COVA_ROI_EDGE=slab python scripts/bench_roi_pool.py 8 64 320 tall
run roi_real_bwalk    env COVA_ROI_BWD=walk python scripts/bench_roi_pool.py 8 64 320 real
run roi_real_fwalk    env COVA_ROI_FWD=walk python scripts/bench_roi_pool.py 8 64 320 real
# Compiled-kernel numerics vs the XLA reference (the pytest oracles run
# interpret mode only — this checks the MOSAIC lowering the chip runs).
run roi_onchip        python scripts/check_roi_onchip.py
# Flagship-geometry ported-checkpoint parity in bf16 on chip (VERDICT r3
# next-5): logit delta + 100% retrieval-pick agreement, artifact JSON.
run parity_flagship   python scripts/parity_flagship.py 2
# CoVA++ (--use_additional_feat — the reference's best published config,
# utils.py:23-25): whole-step bench datapoint with the feature path on.
run bench_af          python -m cova_tpu.cli bench --mode train -bsb 8 --use_additional_feat
# Stretch configs. 'stretch' is the historical 2560px/RN18-stem point
# (comparable to rounds 2-4); 'stretch_full' is the BASELINE.json
# configs[4] stretch AS DEFINED — ResNet-50 backbone, 2x-res
# screenshots, larger K context (VERDICT r4 item 3; the config string
# lands in the JSON via backbone/context_size fields).
run stretch           python -m cova_tpu.cli bench --mode train -bsb 2 --img_height 2560
# stretch_full needs per-block remat: without it the full-RN50 2560px step
# stores 18.19 G of activations against 15.75 G HBM (B=1 no-remat 17.55 G
# and B=4 remat 17.06 G also OOM — B=2+remat is the single-chip operating
# point; artifacts/tpu_r5/stretch_full.err, models/resnet.py use_remat).
run stretch_full      env COVA_REMAT=1 python -m cova_tpu.cli bench --mode train -bsb 2 --img_height 2560 --backbone resnet50 -cs 24

python scripts/summarize_battery.py "$OUT" | tee "$OUT/SUMMARY.txt"
