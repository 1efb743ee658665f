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


def _is_primary() -> bool:
    """True on the host that owns stdout and artifact files (process 0).

    On a pod every host runs the same loop; without this guard each host
    would duplicate every log line and race on shared-filesystem artifacts.
    Lazy jax import: by the time anything logs, the backend is already up.
    """
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def print_and_log(msg: str, log_file: Optional[str], write_mode: str = "a"):
    if not _is_primary():
        return
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
        if not self.path or not _is_primary():
            return
        rec = {"ts": time.time(), "event": event, **fields}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
