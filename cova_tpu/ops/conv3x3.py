"""Pallas 3x3 same-conv via in-VMEM im2col + MXU matmul.

XLA's conv lowering reaches only ~20-30 TFLOP/s on this chip for the
model's 3x3 convolutions (64ch residual blocks, the stem's s2d form), while
plain matmuls measure ~144 TFLOP/s. This kernel turns the conv into the
matmul XLA won't:

  * the input is flattened row-major over a zero-padded (H+2, W+2) image,
    so every one of the nine patch taps is a *sublane-shifted contiguous
    slice* of the same buffer (offset dy*(W+2)+dx) — no gathers, no halo
    blocks;
  * patches are assembled in VMEM at 128-lane-aligned slots ([9*128, O]
    zero-padded weights) and hit the MXU as one [M_tile, 1152] @ [1152, O]
    product per row-tile;
  * backward: dx is the same kernel with spatially-flipped, transposed
    weights; dW is left to XLA (a [3,3,C,O]-output conv whose contraction
    over batch*spatial is already MXU-shaped).

Used for the ResNet basic-block convs and the stem's s2d conv
(``conv_stem.py``); validated against ``lax.conv_general_dilated`` in both
values and gradients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _slot_width(c: int) -> int:
    """Patch-slot lane width: C rounded up to a full 128-lane tile. Mosaic
    cannot DMA-slice HBM arrays at sub-128 lane granularity, so the flat
    input is stored lane-padded and each patch slot copies all 128 lanes
    (the pad lanes are zero and multiply zero weight rows)."""
    return ((c + 127) // 128) * 128


def _kernel(x_ref, w_ref, out_ref, scratch, sem, *,
            m_tile, wp, c, o, slot):
    """One (image, row-tile) program.

    x_ref: [1, L, slot] HBM (ANY) — padded flat rows (lanes zero-padded to
    the slot width); w_ref: [9*slot, o] VMEM; out_ref: [1, m_tile, o] VMEM
    block; scratch: [slab, slot] VMEM.
    """
    bi = pl.program_id(0)
    t = pl.program_id(1)
    m0 = t * m_tile  # into the front-padded flat array

    slab_rows = scratch.shape[0]
    dma = pltpu.make_async_copy(
        x_ref.at[bi, pl.ds(m0, slab_rows), :], scratch, sem
    )
    dma.start()

    dma.wait()
    # Nine shifted [m_tile, slot] x [slot, o] matmuls accumulated in f32 —
    # reads the slab straight into the MXU instead of materializing an
    # im2col patch matrix (9x write amplification measured slower than
    # XLA's conv).
    acc = jnp.zeros((m_tile, out_ref.shape[-1]), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            s = dy * 3 + dx
            acc = acc + jnp.dot(
                scratch[pl.ds(dy * wp + dx, m_tile), :],
                w_ref[s * slot : (s + 1) * slot, :],
                preferred_element_type=jnp.float32,
            )
    out_ref[0, :, :] = acc.astype(out_ref.dtype)


def _conv3x3_impl(x: jnp.ndarray, w: jnp.ndarray, m_tile: int,
                  interpret: bool):
    b, h, wdt, c = x.shape
    o = w.shape[-1]
    slot = _slot_width(c)
    hp, wp = h + 2, wdt + 2

    # Zero-pad the image, flatten row-major, pad front so every slab DMA
    # (starting at m0, spanning m_tile + 2*wp + 2 rows) stays in range.
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    flat = xp.reshape(b, hp * wp, c)
    n_tiles = -(-(hp * wp) // m_tile)
    front = wp + 1
    slab_rows = _round8(m_tile + 2 * wp + 2)
    back = n_tiles * m_tile + slab_rows - (hp * wp) - front + 8
    flat = jnp.pad(
        flat, ((0, 0), (front, max(back, 0)), (0, slot - c))
    )

    wpad = jnp.zeros((9 * slot, o), w.dtype)
    for dy in range(3):
        for dx in range(3):
            s = dy * 3 + dx
            wpad = jax.lax.dynamic_update_slice(
                wpad, w[dy, dx], (s * slot, 0)
            )
    wpad = wpad.astype(x.dtype)

    out_flat = pl.pallas_call(
        functools.partial(
            _kernel, m_tile=m_tile, wp=wp, c=c, o=o, slot=slot
        ),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (9 * slot, o), lambda bi, ti: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, m_tile, o), lambda bi, ti: (bi, ti, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * m_tile, o), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((slab_rows, slot), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(flat, wpad)

    out = out_flat[:, : hp * wp, :].reshape(b, hp, wp, o)
    return out[:, 1 : 1 + h, 1 : 1 + wdt, :]


def _round8(n: int) -> int:
    return ((n + 7) // 8) * 8


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3x3(x: jnp.ndarray, w: jnp.ndarray, m_tile: int = 1024,
            interpret: bool = False):
    """3x3 stride-1 same conv, NHWC. x: [B, H, W, C]; w: [3, 3, C, O]."""
    return _conv3x3_impl(x, w, m_tile, interpret)


def _fwd(x, w, m_tile, interpret):
    return _conv3x3_impl(x, w, m_tile, interpret), (x, w)


def _bwd(m_tile, interpret, res, g):
    x, w = res
    # dx: correlate g with the flipped, io-transposed kernel.
    w_flip = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = _conv3x3_impl(g.astype(x.dtype), w_flip, m_tile, interpret)
    # dW: one conv whose contraction runs over batch*spatial (MXU-shaped in
    # XLA): lhs [C, H+2, W+2, B], rhs [H, W, B, O] -> [C, 3, 3, O].
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dw = jax.lax.conv_general_dilated(
        xp.transpose(3, 1, 2, 0),
        g.transpose(1, 2, 0, 3).astype(x.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).transpose(1, 2, 0, 3)
    return dx, dw.astype(w.dtype)


conv3x3.defvjp(_fwd, _bwd)


def use_pallas_conv() -> bool:
    """Kernel path gate. Off by default pending per-program overhead work:
    measured end-to-end, the tiled im2col kernel currently loses to XLA's
    conv (dispatch/DMA overhead across ~100 programs/image dominates its
    MXU win). Set COVA_PALLAS_CONV=1 to enable on TPU."""
    import os

    return (
        os.environ.get("COVA_PALLAS_CONV") == "1"
        and jax.default_backend() == "tpu"
    )


def conv3x3_auto(x, w, m_tile: int = 1024):
    """conv3x3 through the Pallas kernel on TPU, lax.conv otherwise."""
    if use_pallas_conv():
        return conv3x3(x, w, m_tile, False)
    return conv3x3_reference(x, w)


def conv3x3_reference(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
