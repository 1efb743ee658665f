"""Host fingerprint for keying persistent compile-cache directories.

XLA's persistent compilation cache is keyed by HLO + compiler flags but NOT
by the host CPU's feature set: a CPU-backend executable cached on one
machine can be loaded on another whose CPU lacks the instructions it was
compiled for — XLA warns this "could lead to execution errors such as
SIGILL" (observed in MULTICHIP_r03.json's tail when ``tests/.jax_cache``
traveled across machines). Keying the cache dir by a fingerprint of the
host's CPU features makes a feature-mismatched hit impossible: a different
host simply gets a different (cold) cache directory.
"""

from __future__ import annotations

import hashlib
import platform


def host_fingerprint() -> str:
    """Short stable hash of the host's CPU feature surface."""
    parts = [platform.machine(), platform.system()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # One representative core is enough; 'flags' (x86) or
                # 'Features' (arm) lists the instruction-set extensions.
                if line.startswith(("flags", "Features")):
                    parts.append(line.strip())
                    break
    except OSError:
        pass
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def host_keyed_cache_dir(base: str) -> str:
    """``<base>/<fingerprint>`` — a per-host subdirectory of ``base``."""
    import os

    return os.path.join(base, host_fingerprint())
