"""Logging: stdout + per-fold log file, reference-compatible format.

The log file is a de-facto artifact of the reference
(``/root/reference/utils.py:51-57``; every epoch/eval line in
``train.py:62-71,160-169`` lands there), so the format is preserved verbatim.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


def print_and_log(msg: str, log_file: Optional[str], write_mode: str = "a"):
    print(msg)
    if log_file:
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        with open(log_file, write_mode) as f:
            f.write(msg + "\n")


class MetricsLogger:
    """Structured step-level metrics (beyond the reference: one JSON line per
    event into ``<results_dir>/metrics.jsonl`` for observability)."""

    def __init__(self, path: Optional[str]):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def log(self, event: str, **fields):
        if not self.path:
            return
        rec = {"ts": time.time(), "event": event, **fields}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
