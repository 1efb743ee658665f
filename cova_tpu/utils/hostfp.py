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
    have_features = False
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # One representative core is enough; 'flags' (x86) or
                # 'Features' (arm) lists the instruction-set extensions.
                if line.startswith(("flags", "Features")):
                    parts.append(line.strip())
                    have_features = True
                    break
    except OSError:
        pass
    if not have_features:
        # No feature information (non-Linux, restricted /proc): two
        # same-arch hosts with DIFFERENT feature sets would otherwise
        # collide on hash(machine|system) — the exact mismatch/SIGILL
        # hazard this module exists to prevent. Key by boot (cache reuse
        # within one boot is safe: same CPU) or, failing that, by host
        # name — cold across machines, never feature-mismatched.
        try:
            with open("/proc/sys/kernel/random/boot_id") as f:
                parts.append(f.read().strip())
        except OSError:
            parts.append(platform.node() or "unknown-host")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def host_keyed_cache_dir(base: str) -> str:
    """``<base>/<fingerprint>`` — a per-host subdirectory of ``base``."""
    import os

    return os.path.join(base, host_fingerprint())


def default_cache_base() -> str:
    """User-owned base directory for the persistent compile cache.

    A predictable path under world-writable ``/tmp`` (the old default,
    ``/tmp/jax_cc``) lets another local user pre-create the directory or
    plant serialized XLA executables under the (computable) host
    fingerprint, which JAX would deserialize and run. A home-keyed path is
    private by construction.
    """
    import os

    return os.path.join(
        os.path.expanduser("~"), ".cache", "cova_tpu", "jax_cc"
    )


def ensure_default_compile_cache(base: str | None = None) -> str:
    """Default JAX's persistent compile cache to ``<base>/<fingerprint>``.

    Shared location with scripts/tpu_battery.sh so battery, bench, and
    driver entry runs warm each other: the B=64 flagship train step costs
    ~10 min of XLA compile through the remote tunnel, ~1 min warm. An
    explicit ``JAX_COMPILATION_CACHE_DIR`` in the environment wins; returns
    the directory in effect. The base directory is created 0700 and must
    be owned by the current user — if a pre-existing ``base`` fails that
    check (symlink plant, other-owner dir), the cache is left disabled
    rather than loading executables from an untrusted directory.
    """
    import os

    explicit = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if explicit:
        return explicit
    if base is None:
        base = default_cache_base()
    try:
        os.makedirs(base, mode=0o700, exist_ok=True)
        st = os.lstat(base)
        if not os.path.isdir(base) or os.path.islink(base):
            raise OSError(f"{base} is not a real directory")
        if hasattr(os, "geteuid") and st.st_uid != os.geteuid():
            raise OSError(f"{base} is owned by uid {st.st_uid}, not us")
    except OSError as e:
        import warnings

        warnings.warn(f"compile cache disabled: {e}", stacklevel=2)
        return ""
    import jax

    path = os.path.join(base, host_fingerprint())
    jax.config.update("jax_compilation_cache_dir", path)
    return path
