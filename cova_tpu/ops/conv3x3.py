"""Pallas 3x3 same-conv as nine aligned MXU matmuls.

CLOSED LEVER — measured verdict (scripts/bench_conv.py, B=8 320x320 64ch
bf16 on v5e): XLA's lax.conv runs the shape at **70.6 TFLOP/s**, which is
98% of the structural ceiling: with O=64 output channels only half of the
MXU's 128 result lanes can carry data, capping ANY schedule at ~72 of the
chip's 144 TFLOP/s. The Pallas variants measure 10.2 (output-roll, below)
and 6.0 (dx-copy) — Mosaic inserts relayouts around the per-tap shifted
operands that XLA's native conv emitter avoids. The round-1 "20-30
TFLOP/s" conv estimate came from whole-step profiles where conv time was
conflated with the surrounding BN/pool fusions (since excised into
``ops/bn_pool.py``); on the isolated op there is nothing left to win.
Both kernels are kept as negative results + regression oracles, gated off.

This kernel feeds the conv to the MXU as matmuls over a row-major
flattened image:

  * the image is zero-padded to (H+2, W8) with the padded row width W8
    rounded to a sublane multiple, then flattened row-major, so the nine
    patch taps become slices at offsets ``dy*W8 + dx``;
  * the ``dx`` component would misalign VMEM slices (Mosaic relayouts ate a
    first im2col attempt's MXU win), so each row-tile issues THREE DMAs —
    one per dx, each starting at the (arbitrary, DMA-friendly) offset
    ``m0 + dx`` — after which every in-VMEM tap slice sits at the 8-aligned
    offset ``dy*W8``;
  * nine [M_tile, 128] x [128, O] matmuls accumulate in f32 (input channels
    lane-padded to 128; the pad lanes are zero against zero weight rows);
  * backward: dx is the same kernel with spatially-flipped, transposed
    weights; dW is one XLA conv whose contraction runs over batch*spatial
    (already MXU-shaped).

Validated against ``lax.conv_general_dilated`` in values and gradients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round8(n: int) -> int:
    return ((n + 7) // 8) * 8


def _slot_width(c: int) -> int:
    """Lane width per tap: C rounded to a full 128-lane tile (HBM arrays
    cannot be DMA-sliced at sub-128 lane granularity)."""
    return ((c + 127) // 128) * 128


def _kernel(x_ref, w_ref, out_ref, slabs, sems, *, m_tile, w8, slot):
    """One (image, row-tile) program.

    x_ref: [B, 3, L, slot] HBM (ANY) — dx-shifted copies so every DMA
    start (t*m_tile) is sublane-aligned; w_ref: [9*slot, o] VMEM;
    out_ref: [1, m_tile, o] VMEM block; slabs: [3, slab_rows, slot] VMEM.
    """
    bi = pl.program_id(0)
    t = pl.program_id(1)
    m0 = t * m_tile
    slab_rows = slabs.shape[1]

    dmas = []
    for dx in range(3):
        dma = pltpu.make_async_copy(
            x_ref.at[bi, dx, pl.ds(m0, slab_rows), :],
            slabs.at[dx],
            sems.at[dx],
        )
        dma.start()
        dmas.append(dma)
    for dma in dmas:
        dma.wait()

    acc = jnp.zeros((m_tile, out_ref.shape[-1]), jnp.float32)
    for dy in range(3):
        off = dy * w8  # 8-aligned: w8 is a sublane multiple
        for dx in range(3):
            s = dy * 3 + dx
            acc = acc + jnp.dot(
                slabs[dx, off : off + m_tile, :],
                w_ref[s * slot : (s + 1) * slot, :],
                preferred_element_type=jnp.float32,
            )
    out_ref[0, :, :] = acc.astype(out_ref.dtype)


def _roll_kernel(x_ref, w_ref, out_ref, slab, sem, *, m_tile, w8, slot):
    """Output-stationary variant: ONE un-shifted slab DMA per tile; the
    dx=+-1 taps become pltpu.roll on the f32 matmul OUTPUT panels (roll is
    only implemented for 32-bit data — bf16 inputs cannot be rolled, which
    is why the shift rides the output side). An 8-row margin at each end of
    the m_ext window absorbs the roll wrap-around, and every slice start
    (dy*w8, margin trim) is sublane-aligned by construction.

    x_ref: [B, L, slot] HBM; slab: [slab_rows, slot] VMEM scratch rows
    F[m0 : m0+slab_rows) where F carries a (w8+9)-zero front pad so slab
    row k*w8 + r holds the (dy=k-1, dx=-1) tap of output row m0 - 8 + r.
    """
    bi = pl.program_id(0)
    t = pl.program_id(1)
    m0 = t * m_tile
    m_ext = m_tile + 16

    dma = pltpu.make_async_copy(
        x_ref.at[bi, pl.ds(m0, slab.shape[0]), :], slab, sem
    )
    dma.start()
    dma.wait()

    acc = jnp.zeros((m_ext, out_ref.shape[-1]), jnp.float32)
    for k in range(3):
        a = slab[pl.ds(k * w8, m_ext), :]  # aligned: w8, m_ext mult of 8
        for j in range(3):
            s = k * 3 + j
            p = jnp.dot(
                a,
                w_ref[s * slot : (s + 1) * slot, :],
                preferred_element_type=jnp.float32,
            )
            # P[r] contributes to output row r - j; j=0 adds in place.
            acc = acc + (p if j == 0 else pltpu.roll(p, m_ext - j, 0))
    out_ref[0, :, :] = acc[8 : 8 + m_tile].astype(out_ref.dtype)


def _conv3x3_roll_impl(x: jnp.ndarray, w: jnp.ndarray, m_tile: int,
                       interpret: bool):
    b, h, wdt, c = x.shape
    o = w.shape[-1]
    slot = _slot_width(c)
    hp = h + 2
    w8 = _round8(wdt + 2)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, w8 - wdt - 1), (0, 0)))
    flat = xp.reshape(b, hp * w8, c)
    n_tiles = -(-(hp * w8) // m_tile)
    m_ext = m_tile + 16
    # Slab for tile t covers F[m0 : m0 + slab_rows); front pad w8 + 9 makes
    # slab row k*w8 + r the (dy=k-1, dx=-1) tap of output row m0 - 8 + r,
    # with every DMA start sublane-aligned (m0 is a multiple of m_tile).
    slab_rows = _round8(m_ext + 2 * w8)
    front = w8 + 9
    back = max(0, (n_tiles - 1) * m_tile + slab_rows - hp * w8 - front) + 8
    flat = jnp.pad(flat, ((0, 0), (front, back), (0, slot - c)))

    wpad = jnp.zeros((9 * slot, o), w.dtype)
    for dy in range(3):
        for dx in range(3):
            s = dy * 3 + dx
            wpad = jax.lax.dynamic_update_slice(
                wpad, w[dy, dx], (s * slot, 0)
            )
    wpad = wpad.astype(x.dtype)

    out_flat = pl.pallas_call(
        functools.partial(_roll_kernel, m_tile=m_tile, w8=w8, slot=slot),
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

    out = out_flat[:, : hp * w8, :].reshape(b, hp, w8, o)
    return out[:, 1 : 1 + h, 1 : 1 + wdt, :]


def _conv3x3_impl(x: jnp.ndarray, w: jnp.ndarray, m_tile: int,
                  interpret: bool):
    b, h, wdt, c = x.shape
    o = w.shape[-1]
    slot = _slot_width(c)
    hp = h + 2
    w8 = _round8(wdt + 2)

    # Zero-pad to (hp, w8): col 0 is the conv's left pad, cols wdt+1..w8-1
    # are right pad + row-width alignment. Flatten row-major and lane-pad.
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, w8 - wdt - 1), (0, 0)))
    flat = xp.reshape(b, hp * w8, c)
    n_tiles = -(-(hp * w8) // m_tile)
    front = w8 + 1
    slab_rows = _round8(m_tile + 2 * w8 + 8)
    back = max(
        0, (n_tiles - 1) * m_tile + slab_rows + 2 - hp * w8 - front
    ) + 8
    flat = jnp.pad(flat, ((0, 0), (front, back), (0, slot - c)))
    # dx-shifted copies (DMA starts must be sublane-aligned; +dx is not).
    length = flat.shape[1] - 2
    flat = jnp.stack(
        [flat[:, d : d + length] for d in range(3)], axis=1
    )  # [B, 3, L, slot]

    wpad = jnp.zeros((9 * slot, o), w.dtype)
    for dy in range(3):
        for dx in range(3):
            s = dy * 3 + dx
            wpad = jax.lax.dynamic_update_slice(
                wpad, w[dy, dx], (s * slot, 0)
            )
    wpad = wpad.astype(x.dtype)

    out_flat = pl.pallas_call(
        functools.partial(_kernel, m_tile=m_tile, w8=w8, slot=slot),
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
            pltpu.VMEM((3, slab_rows, slot), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(flat, wpad)

    out = out_flat[:, : hp * w8, :].reshape(b, hp, w8, o)
    return out[:, 1 : 1 + h, 1 : 1 + wdt, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3x3(x: jnp.ndarray, w: jnp.ndarray, m_tile: int = 2048,
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


def conv3x3_roll(x: jnp.ndarray, w: jnp.ndarray, m_tile: int = 2048,
                 interpret: bool = False):
    """Experimental output-stationary 3x3 conv (see ``_roll_kernel``).
    Forward only — gets a custom_vjp like ``conv3x3`` if it ever wins the
    on-chip shoot-out (scripts/bench_conv.py)."""
    return _conv3x3_roll_impl(x, w, m_tile, interpret)


def use_pallas_conv() -> bool:
    """Kernel path gate, default OFF: three structurings were measured on
    chip (im2col patches 7.0 ms, 9 misaligned-slice matmuls 6.6 ms, aligned
    dx-copy DMAs 10.0 ms) and all lose to XLA's conv (2.4-2.8 ms) for the
    model's 64ch 3x3 shapes — relayout or data-duplication costs eat the
    MXU win. Set COVA_PALLAS_CONV=1 to experiment."""
    import os

    return (
        os.environ.get("COVA_PALLAS_CONV") == "1"
        and jax.default_backend() == "tpu"
    )


def conv3x3_auto(x, w, m_tile: int = 2048):
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
