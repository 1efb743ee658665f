#!/bin/bash
# Drive the VERBATIM 5-fold protocol at corpus scale (VERDICT r4 item 1).
#
# The real dataset is external/unreachable, so this runs against the
# synthesized corpus clone (scripts/make_corpus_clone.py): one hard-mode
# page per REAL page id in splits/all_imgs.txt (7,740 pages / 408 domains),
# reference on-disk layout. `cova train` then loads the verbatim
# splits/Fold-k lists (reference main.py:36-51), checks disjointness,
# computes the 408-domain macro report (evaluate.py:47-78), and paces
# epochs at true corpus scale — NO --synthetic flag anywhere.
#
# Usage: scripts/corpus_protocol.sh [fold ...]   (default: 1 2 3 4 5)
set -u
cd "$(dirname "$0")/.."
CLONE=${CLONE:-.corpus_clone}
OUT=${OUT:-artifacts/corpus_r5}
IMGH=${IMGH:-512}
FOLDS=${*:-1 2 3 4 5}
mkdir -p "$OUT"

if [ ! -f "$CLONE/corpus_oracle.csv" ]; then
  echo "=== generating corpus clone ($CLONE, ${IMGH}px) ==="
  python scripts/make_corpus_clone.py --out "$CLONE" --img_height "$IMGH" \
    || exit 1
fi

# Warm persistent compile cache (host-keyed, user-owned 0700 — hostfp.py).
_cc=$(python -c "from cova_tpu.utils.hostfp import ensure_default_compile_cache as e; \
import sys; p=e(); print(p) if p else sys.exit(1)") || _cc=""
[ -n "$_cc" ] && export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$_cc}

rc=0
for f in $FOLDS; do
  echo "=== Fold-$f: corpus-scale train (reference defaults, ${IMGH}px) ==="
  timeout 14400 python -m cova_tpu.cli train \
    --data_dir "$CLONE" -cvf "$f" --img_height "$IMGH" \
    --output_dir "$OUT" --decode_cache "/tmp/cova_decode_$IMGH" \
    2>&1 | tee "$OUT/fold${f}_console.log" | tail -40
  s=${PIPESTATUS[0]}; rc=$((rc | s)); echo "rc=$s done fold$f"
done

# On-chip attention extraction + overlay rendering from the Fold-1
# corpus checkpoint (VERDICT r4 item 5: C20/C21 at real geometry, not
# just the small-CPU test fixture). One CSV + one PNG land in
# artifacts/tpu_r5/ as checked-in evidence.
echo "=== Fold-1 attention visualization (cova visualize, 3 pages) ==="
timeout 3600 python -m cova_tpu.cli visualize \
  --data_dir "$CLONE" -cvf 1 --img_height "$IMGH" \
  --output_dir "$OUT" --max_pages 3 \
  2>&1 | tee "$OUT/visualize_console.log" | tail -15
echo "rc=${PIPESTATUS[0]} done visualize"
VIZ=$(ls -d "$OUT"/*/"Fold-1 attention visualization" 2>/dev/null | head -1)
if [ -n "$VIZ" ]; then
  mkdir -p artifacts/tpu_r5
  cp "$(ls "$VIZ"/*.csv | head -1)" artifacts/tpu_r5/attn_corpus_page.csv
  cp "$(ls "$VIZ"/*.png | head -1)" artifacts/tpu_r5/attn_corpus_page.png
  ls -la artifacts/tpu_r5/attn_corpus_page.*
fi

echo "=== per-fold Bayes-oracle ceilings over the verbatim test lists ==="
python scripts/corpus_oracle_summary.py --clone "$CLONE" \
  | tee "$OUT/oracle_summary.txt"

# Published-table aggregation over whatever folds have rows so far.
python - "$OUT" <<'EOF'
import glob, os, sys
from cova_tpu.cli import sweep_summary
paths = glob.glob(os.path.join(sys.argv[1], "*", "fold_wise_acc.csv"))
for p in paths:
    s = sweep_summary(p, [1, 2, 3, 4, 5])
    if s:
        print(f"--- {p} ---\n{s}", end="")
        with open(os.path.join(os.path.dirname(p), "sweep_summary.txt"),
                  "w") as f:
            f.write(s)
EOF
exit $rc
