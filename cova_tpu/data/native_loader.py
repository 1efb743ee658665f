"""ctypes bindings for the native host runtime (``native/cova_native.cpp``).

Provides C-speed PNG screenshot decode (libpng + pthread pool) and bbox-CSV
parsing for the input pipeline — the framework's native replacement for the
reference's reliance on PIL + DataLoader worker processes
(``/root/reference/datasets.py:96-97,227-258``). Falls back to the pure-
Python path transparently when the shared library hasn't been built
(``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _lib_path() -> str:
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    return os.path.join(root, "native", "libcova_native.so")


def load_library(path: Optional[str] = None) -> Optional[ctypes.CDLL]:
    """Load (and memoize) the native library; None if unavailable."""
    global _LIB, _LIB_TRIED
    if _LIB is not None:
        return _LIB
    if _LIB_TRIED and path is None:
        return None
    _LIB_TRIED = True
    try:
        lib = ctypes.CDLL(path or _lib_path())
    except OSError:
        return None
    try:
        _bind(lib)
    except AttributeError:
        # Stale libcova_native.so missing a newer symbol (e.g. built
        # before cova_decode_png_batch_ex existed): fall back to the
        # pure-Python path as documented instead of crashing callers.
        return None
    _LIB = lib
    return lib


def _bind(lib: ctypes.CDLL) -> None:
    lib.cova_decode_png.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.cova_decode_png.restype = ctypes.c_int
    lib.cova_decode_png_batch_ex.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.cova_decode_png_batch_ex.restype = ctypes.c_int
    lib.cova_parse_bbox_csv.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    lib.cova_parse_bbox_csv.restype = ctypes.c_int


def available() -> bool:
    return load_library() is not None


def decode_png(path: str, h: int, w: int) -> np.ndarray:
    """Decode one PNG to uint8 [h, w, 3] (zero-pad/crop to the target)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    out = np.empty((h, w, 3), dtype=np.uint8)
    rc = lib.cova_decode_png(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        h,
        w,
    )
    if rc != 0:
        raise IOError(f"cova_decode_png({path}) failed with code {rc}")
    return out


def decode_png_batch(
    paths: Sequence[str], h: int, w: int, nthreads: int = 4,
    s2d4: bool = False,
) -> np.ndarray:
    """Decode a batch of PNGs with a C thread pool. Returns uint8
    [n, h, w, 3], or — with ``s2d4=True`` (h, w % 4 == 0) — the TPU input
    layout [n, h/4, w/4, 48] (space-to-depth done in C right after each
    decode, while the rows are cache-warm)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    n = len(paths)
    shape = (n, h // 4, w // 4, 48) if s2d4 else (n, h, w, 3)
    out = np.empty(shape, dtype=np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if s2d4 and (h % 4 or w % 4):
        raise ValueError(f"s2d4 requires h, w % 4 == 0, got ({h}, {w})")
    failures = lib.cova_decode_png_batch_ex(
        arr,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        h,
        w,
        nthreads,
        1 if s2d4 else 0,
    )
    if failures < 0:
        raise ValueError(f"cova_decode_png_batch_ex error code {failures}")
    if failures:
        raise IOError(f"{failures}/{n} PNG decodes failed")
    return out


def parse_bbox_csv(path: str, max_rows: int = 4096) -> np.ndarray:
    """Parse a bbox CSV (header + rows x,y,w,h,label) -> float32 [n, 5]."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    buf = np.empty((max_rows, 5), dtype=np.float32)
    n = lib.cova_parse_bbox_csv(
        path.encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_rows,
    )
    if n < 0:
        raise IOError(f"cova_parse_bbox_csv({path}) failed with code {n}")
    return buf[:n].copy()


def ensure_built(quiet: bool = True) -> bool:
    """Build the library in-tree if a toolchain is available."""
    if available():
        return True
    import subprocess

    native_dir = os.path.dirname(_lib_path())
    try:
        subprocess.run(
            ["make", "-C", native_dir],
            check=True,
            capture_output=quiet,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    global _LIB_TRIED
    _LIB_TRIED = False
    return available()
