#!/bin/bash
# OOM-resilient single-fold driver for the corpus protocol.
#
# Long corpus runs grow host RSS (~4-5 GB/epoch at 512px through the
# remote-TPU tunnel — see scripts/probe_dispatch_leak.py); on a 125 GB
# box a >25-epoch fold can be OOM-killed mid-run. The trainer checkpoints
# "last" (params+opt+epoch+patience) every epoch and --resume continues
# the exact dropout/shuffle stream (trainer.py:292-297), so the recovery
# is: relaunch the same command with --resume until it exits 0. Attempt 1
# also passes --resume — with no checkpoint present it trains fresh.
#
# Usage: scripts/corpus_fold.sh FOLD [extra cova-train args...]
set -u
cd "$(dirname "$0")/.."
CLONE=${CLONE:-.corpus_clone}
OUT=${OUT:-artifacts/corpus_r5}
IMGH=${IMGH:-512}
ATTEMPTS=${ATTEMPTS:-4}
f=$1; shift
mkdir -p "$OUT"

_cc=$(python -c "from cova_tpu.utils.hostfp import ensure_default_compile_cache as e; \
import sys; p=e(); print(p) if p else sys.exit(1)") || _cc=""
[ -n "$_cc" ] && export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$_cc}

rc=1
: > "$OUT/fold${f}_console.log"
for attempt in $(seq 1 "$ATTEMPTS"); do
  echo "=== Fold-$f attempt $attempt (corpus-scale train, ${IMGH}px) ==="
  timeout 14400 python -m cova_tpu.cli train \
    --data_dir "$CLONE" -cvf "$f" --img_height "$IMGH" \
    --output_dir "$OUT" --decode_cache "/tmp/cova_decode_$IMGH" \
    --resume "$@" \
    2>&1 | tee -a "$OUT/fold${f}_console.log" | tail -40
  rc=${PIPESTATUS[0]}
  echo "rc=$rc fold$f attempt $attempt"
  [ "$rc" -eq 0 ] && break
done
exit $rc
