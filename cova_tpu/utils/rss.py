"""Host-RSS watchdog for long runs through the remote-TPU tunnel.

Measured on chip (``scripts/probe_dispatch_leak.py``,
``artifacts/tpu_r5/dispatch_leak.out``): every host->device transfer
retains roughly its payload bytes in host RSS, process-globally —

  * NOT Python references: ``jax.live_arrays()`` stays flat while RSS
    grows ~3.8 MB/step at a 5x512x512x3 uint8 batch (== payload size);
  * NOT client-scoped: ``jax.extend.backend.clear_backends()`` frees
    nothing and the slope resumes after re-init;
  * NOT glibc arena retention: ``malloc_trim(0)`` recovers ~12 MB of GBs.

At corpus scale (~930 train + ~160 eval dispatches/epoch, 512px) that is
~4-5 GB/epoch — a 125 GB host dies mid-fold around epoch 25. The only
mitigation that works is process recycling: the trainer checkpoints
"last" (params+opt+epoch+patience) every epoch and ``--resume`` continues
the exact dropout/shuffle stream (``trainer.py``: per-epoch fold_in
streams), so exec-ing the same command line with ``--resume`` is
semantically invisible to training. This module provides the measurement
+ threshold; ``cli.cmd_train`` wires the re-exec.

The reference never hits this class of failure (single-process CUDA,
``/root/reference/train.py`` runs minutes per epoch on local hardware);
it belongs to the remote-tunnel deployment model, SURVEY §5 A3 (failure
recovery).
"""

from __future__ import annotations

import os

_ENV = "COVA_RSS_LIMIT_GB"
_DEFAULT_FRACTION = 0.75  # of MemTotal — leaves one epoch's growth + eval


def rss_gb() -> float:
    """Current process VmRSS in GB (0.0 where /proc is unavailable)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / (1024.0 * 1024.0)
    except OSError:
        pass
    return 0.0


def mem_total_gb() -> float:
    """Host MemTotal in GB (0.0 where /proc is unavailable)."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal"):
                    return int(line.split()[1]) / (1024.0 * 1024.0)
    except OSError:
        pass
    return 0.0


def rss_limit_gb() -> float:
    """Restart threshold in GB. ``COVA_RSS_LIMIT_GB`` overrides (<=0
    disables); default is 75% of MemTotal, inf where unreadable."""
    env = os.environ.get(_ENV)
    if env is not None:
        v = float(env)
        return v if v > 0 else float("inf")
    total = mem_total_gb()
    return _DEFAULT_FRACTION * total if total > 0 else float("inf")


def over_limit() -> bool:
    return rss_gb() > rss_limit_gb()
