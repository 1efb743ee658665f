"""W-packed 3x3 convolution: fill the 128-lane tile at C=64.

Why: layer1 of the reference backbone (``/root/reference/models.py:48-56``)
runs at 64 channels. TPU tiled layouts round the minor (channel) dim up to
128 lanes, so EVERY elementwise/BN pass over a [B, H, W, 64] map moves 2x
its logical bytes, and convolutions with O=64 can only fill half of the
MXU's 128 result lanes (~72 of 144 TFLOP/s, the round-2 "structural
ceiling"). Packing adjacent column pairs into channels fixes both at once:

    pack_w:  [B, H, W, C]  ->  [B, H, W/2, 2C]   (pure reshape: row-major
                                                  (w, c) == (w/2, 2c))
    conv:    3x3/1 on the packed domain with a [3, 3, 2C, 2O] kernel
             scattered from the logical [3, 3, C, O] taps

Derivation: output column 2j+ex' needs input columns 2j+ex'+dx-1 for taps
dx in {0,1,2}; writing s = ex'+dx-1 = 2*du + ex gives du in {-1,0,1} — a
3-wide window over packed columns — with input channel slot (ex, c) and
output slot (ex', o). 3 of the 6 (du, ex) slots per ex' carry weight, so
the dense packed kernel does 2x the logical FLOPs — but measured on v5e
(scripts/bench_packed_layout.py, B=8 320^2 bf16) the [3,3,128,128] conv
runs at 144.9 TFLOP/s vs the [3,3,64,64]'s 66.8: 2x the FLOPs in LESS
wall-clock (0.83 vs 0.90 ms), with every surrounding elementwise pass at
half the HBM traffic.

The tap scatter is a static gather (``k_flat[INDEX]``), so autodiff
scatter-adds the packed-kernel gradient back onto the logical [3,3,C,O]
parameter for free (same construction as ``conv_stem._tap_index``).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

_PACK = 2  # column pairs


def pack_w(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H, W/2, 2C], channel order (ex, c). A pure
    row-major reshape (the (w, c) minor dims regroup as (w/2, (ex c)))."""
    b, h, w, c = x.shape
    assert w % _PACK == 0, (w,)
    return x.reshape(b, h, w // _PACK, _PACK * c)


def unpack_w(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W/2, 2C] -> [B, H, W, C] (inverse of ``pack_w``)."""
    b, h, wp, c2 = x.shape
    return x.reshape(b, h, wp * _PACK, c2 // _PACK)


@functools.lru_cache(maxsize=None)
def _packed_tap_index(cin: int):
    """Gather map [3, 3, 2*cin, 2] from the flat logical taps
    [9*cin + 1] (last = zero row): entry (dy, du+1, ex*cin+c, ex') holds
    flat index (dy*3 + dx)*cin + c for the logical tap that lands there,
    or the zero row where no tap does."""
    idx = np.full((3, 3, _PACK * cin, _PACK), 9 * cin, np.int32)
    for exo in range(_PACK):
        for dy in range(3):
            for dx in range(3):
                s = exo + dx - 1
                du, ex = s // _PACK, s % _PACK
                for c in range(cin):
                    idx[dy, du + 1, ex * cin + c, exo] = (dy * 3 + dx) * cin + c
    return idx


def pack_kernel3x3(k: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, C, O] logical kernel -> [3, 3, 2C, 2O] packed kernel
    (differentiable: gradient scatter-adds back onto the logical taps)."""
    kh, kw, cin, o = k.shape
    assert (kh, kw) == (3, 3), (kh, kw)
    idx = jnp.asarray(_packed_tap_index(cin))
    k_flat = jnp.concatenate(
        [k.reshape(9 * cin, o), jnp.zeros((1, o), k.dtype)], axis=0
    )
    kp = k_flat[idx]  # [3, 3, 2C, 2, O]
    return kp.reshape(3, 3, _PACK * cin, _PACK * o)


def packed_conv3x3(xp: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """3x3/1 SAME conv on the packed domain.

    xp: [B, H, W/2, 2C] (from ``pack_w``); k: logical [3, 3, C, O].
    Returns [B, H, W/2, 2O] — ``unpack_w`` of it equals
    ``conv3x3_reference(unpack_w(xp), k)``.
    """
    from .conv3x3 import conv3x3_reference

    return conv3x3_reference(xp, pack_kernel3x3(k).astype(xp.dtype))
