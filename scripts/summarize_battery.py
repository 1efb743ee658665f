#!/usr/bin/env python
"""Summarize artifacts/tpu_r3/*.out into one table (run after
scripts/tpu_battery.sh completes)."""

import glob
import json
import os
import sys

out_dir = sys.argv[1] if len(sys.argv) > 1 else "artifacts/tpu_r3"
for path in sorted(glob.glob(os.path.join(out_dir, "*.out"))):
    name = os.path.basename(path)[:-4]
    lines = [ln.strip() for ln in open(path) if ln.strip()]
    summary = ""
    for ln in reversed(lines):
        if ln.startswith("{"):
            try:
                obj = json.loads(ln)
                summary = (
                    f"{obj.get('value')} {obj.get('unit', '')} "
                    f"(step {obj.get('step_ms', '-')} ms, "
                    f"vs_baseline {obj.get('vs_baseline', '-')})"
                )
                break
            except json.JSONDecodeError:
                continue
    if not summary:
        summary = " | ".join(lines[-2:]) if lines else "(empty)"
    print(f"{name:18s} {summary}")
