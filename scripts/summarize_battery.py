#!/usr/bin/env python
"""Summarize artifacts/tpu_r3/*.out into one table (run after
scripts/tpu_battery.sh completes)."""

import glob
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
from bench import _parse_json_line  # noqa: E402 — the one JSON-line parser

out_dir = sys.argv[1] if len(sys.argv) > 1 else "artifacts/tpu_r3"
for path in sorted(glob.glob(os.path.join(out_dir, "*.out"))):
    name = os.path.basename(path)[:-4]
    text = open(path).read()
    lines = [ln.strip() for ln in text.splitlines() if ln.strip()]
    line = _parse_json_line(text)  # requires metric+value keys
    if line is not None:
        obj = json.loads(line)
        summary = f"{obj.get('value')} {obj.get('unit', '')}"
        if "step_ms" in obj:
            summary += f", step {obj['step_ms']} ms"
        if obj.get("vs_baseline") is not None:
            summary += f", {obj['vs_baseline']}x baseline"
    else:
        # Text output (roi A/Bs, eval_chunk): keep enough tail lines to
        # preserve both the fwd and fwd+bwd numbers plus their header.
        summary = " | ".join(lines[-4:]) if lines else "(empty)"
    print(f"{name:18s} {summary}")
