"""RoI max-pooling over a conv feature map, TPU-native.

Replaces the one genuinely-native dependency of the reference — torchvision's
C++/CUDA ``RoIPool`` op (``/root/reference/models.py:58,124-127``) — with an
XLA formulation built for static shapes and vector units, plus a Pallas kernel
(``roi_pool_pallas.py``) for the hot path.

Semantics are bit-compatible with ``torchvision.ops.roi_pool``:
  * box coords are scaled by ``spatial_scale`` and quantized with
    round-half-away-from-zero (C++ ``roundf``, on the whole domain —
    negative coords included),
  * roi width/height use the inclusive-end convention ``end - start + 1``
    clamped to >= 1,
  * bin boundaries are ``floor(i * roi/out) .. ceil((i+1) * roi/out)`` offset
    by the roi start and clipped to the feature map,
  * empty bins produce 0.

The TPU formulation: a per-image **row sparse table** ``T[k][y] = max over
rows [y, y + 2^k)`` lets any bin's row-range max be the max of two gathered
rows (classic range-max-query); the column reduction then applies a static
per-bin mask. Everything is a dense gather/elementwise-max over
``[P, out, W, C]`` blocks — no data-dependent shapes, no scalar loops.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _quantize(v: jnp.ndarray, scale: float) -> jnp.ndarray:
    """round half away from zero (torchvision's ``roundf``), as int32.

    ``floor(v*scale + 0.5)`` would only match for non-negative scaled
    coords (floor(-0.5 + 0.5) = 0 vs roundf(-0.5) = -1); box coords are
    non-negative in the dataset, but nothing clips user-supplied boxes,
    so match torch on the whole domain."""
    vs = v * scale
    return jnp.trunc(vs + jnp.where(vs >= 0, 0.5, -0.5)).astype(jnp.int32)


def _bin_bounds(start, roi_len, out_size, limit):
    """Start/end feature rows (cols) of each output bin.

    start: [P] int32 roi start; roi_len: [P] int32 (>= 1).
    Returns (lo, hi): each [P, out_size] int32, clipped to [0, limit].

    Bounds are the exact rationals ``floor(i * roi/out)`` /
    ``ceil((i+1) * roi/out)`` computed in integer arithmetic — deterministic
    on every backend (XLA's f32 division is not IEEE-correctly-rounded, and
    torchvision's own f32 bin math differs between builds at 1-ulp
    boundaries; integer math sidesteps both).
    """
    i = jnp.arange(out_size, dtype=jnp.int32)
    rl = roi_len[:, None]  # [P, 1]
    lo = (i[None, :] * rl) // out_size + start[:, None]
    hi = ((i[None, :] + 1) * rl + out_size - 1) // out_size + start[:, None]
    lo = jnp.clip(lo, 0, limit)
    hi = jnp.clip(hi, 0, limit)
    return lo, hi


def _row_sparse_table(fm: jnp.ndarray, n_levels: int) -> jnp.ndarray:
    """T[k][y] = max(fm[y : y + 2**k]) along axis 0, clamped at the edge.

    fm: [H, W, C] -> [n_levels, H, W, C]. Entries whose window would cross
    the boundary are edge-clamped; range queries never read those (the query
    level always satisfies ``start + 2^k <= H``).
    """
    levels = [fm]
    t = fm
    h = fm.shape[0]
    for k in range(1, n_levels):
        shift = 1 << (k - 1)
        idx = jnp.minimum(jnp.arange(h) + shift, h - 1)
        t = jnp.maximum(t, t[idx])
        levels.append(t)
    return jnp.stack(levels, axis=0)


def _floor_log2(x: jnp.ndarray) -> jnp.ndarray:
    """floor(log2(x)) for int32 x >= 1, exactly (bit-length - 1)."""
    # 31 - clz(x); jnp.frexp-free integer version via float exponent is unsafe
    # at exact powers of two under rounding, so count bits.
    out = jnp.zeros_like(x)
    v = x
    for shift in (16, 8, 4, 2, 1):
        big = v >= (1 << shift)
        out = out + jnp.where(big, shift, 0)
        v = jnp.where(big, v >> shift, v)
    return out


def _roi_pool_single(fm, boxes, *, spatial_scale, out_h, out_w):
    """One image. fm: [H, W, C]; boxes: [P, 4] x1y1x2y2 in image coords.

    Returns [P, out_h, out_w, C].
    """
    H, W, C = fm.shape
    P = boxes.shape[0]

    x1 = _quantize(boxes[:, 0], spatial_scale)
    y1 = _quantize(boxes[:, 1], spatial_scale)
    x2 = _quantize(boxes[:, 2], spatial_scale)
    y2 = _quantize(boxes[:, 3], spatial_scale)
    roi_w = jnp.maximum(x2 - x1 + 1, 1)  # inclusive-end convention
    roi_h = jnp.maximum(y2 - y1 + 1, 1)

    ylo, yhi = _bin_bounds(y1, roi_h, out_h, H)  # [P, out_h]
    xlo, xhi = _bin_bounds(x1, roi_w, out_w, W)  # [P, out_w]

    # ---- row range-max via sparse table + two gathers ----
    n_levels = max(1, math.floor(math.log2(max(H, 1))) + 1)
    table = _row_sparse_table(fm, n_levels)  # [L, H, W, C]

    ylen = yhi - ylo  # [P, out_h]; may be <= 0 (empty)
    k = _floor_log2(jnp.maximum(ylen, 1))
    # max over [ylo, ylo+2^k) U [yhi-2^k, yhi) == max over [ylo, yhi)
    top = table[k, jnp.clip(ylo, 0, H - 1)]  # [P, out_h, W, C]
    bot = table[k, jnp.clip(yhi - (1 << k), 0, H - 1)]
    rowmax = jnp.maximum(top, bot)  # [P, out_h, W, C]

    # ---- column masked max (out_w is tiny and static: unrolled) ----
    xs = jnp.arange(W, dtype=jnp.int32)
    neg = jnp.asarray(-jnp.inf, dtype=fm.dtype)
    cols = []
    for j in range(out_w):
        m = (xs[None, :] >= xlo[:, j : j + 1]) & (
            xs[None, :] < xhi[:, j : j + 1]
        )  # [P, W]
        masked = jnp.where(m[:, None, :, None], rowmax, neg)
        cols.append(jnp.max(masked, axis=2))  # [P, out_h, C]
    out = jnp.stack(cols, axis=2)  # [P, out_h, out_w, C]

    # ---- empty bins -> 0 (torchvision roi_pool_kernel behavior) ----
    empty = (ylen <= 0)[:, :, None] | ((xhi - xlo) <= 0)[:, None, :]
    out = jnp.where(empty[..., None], jnp.zeros((), fm.dtype), out)
    return out


@functools.partial(
    jax.jit, static_argnames=("spatial_scale", "out_h", "out_w")
)
def roi_pool(features, boxes, *, spatial_scale, out_h=3, out_w=3):
    """Batched RoIPool.

    features: [B, H, W, C]; boxes: [B, P, 4] x1y1x2y2 (image coordinates).
    Returns [B, P, out_h, out_w, C] in ``features.dtype``.
    """
    fn = functools.partial(
        _roi_pool_single,
        spatial_scale=spatial_scale,
        out_h=out_h,
        out_w=out_w,
    )
    return jax.vmap(fn)(features, boxes)


# ---------------------------------------------------------------------------
# Slow numpy oracle for tests (direct transcription of the semantics above).
# ---------------------------------------------------------------------------
def roi_pool_reference(features, boxes, *, spatial_scale, out_h=3, out_w=3):
    features = np.asarray(features, dtype=np.float32)
    boxes = np.asarray(boxes, dtype=np.float32)
    B, H, W, C = features.shape
    P = boxes.shape[1]
    out = np.zeros((B, P, out_h, out_w, C), dtype=np.float32)
    for b in range(B):
        for p in range(P):
            def q(v):  # roundf: half away from zero (matches _quantize)
                vs = float(v) * spatial_scale
                return int(math.trunc(vs + (0.5 if vs >= 0 else -0.5)))

            x1 = q(boxes[b, p, 0])
            y1 = q(boxes[b, p, 1])
            x2 = q(boxes[b, p, 2])
            y2 = q(boxes[b, p, 3])
            rw = max(x2 - x1 + 1, 1)
            rh = max(y2 - y1 + 1, 1)
            for i in range(out_h):
                hs = min(max((i * rh) // out_h + y1, 0), H)
                he = min(max(-((-(i + 1) * rh) // out_h) + y1, 0), H)
                for j in range(out_w):
                    ws = min(max((j * rw) // out_w + x1, 0), W)
                    we = min(max(-((-(j + 1) * rw) // out_w) + x1, 0), W)
                    if he <= hs or we <= ws:
                        continue
                    out[b, p, i, j] = features[b, hs:he, ws:we].max(
                        axis=(0, 1)
                    )
    return out
