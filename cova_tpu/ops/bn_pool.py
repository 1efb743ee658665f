"""Fused BatchNorm-normalize + ReLU + 3x3/2 max-pool over the stem's s2d
output, as one Pallas kernel pair (fwd + custom-VJP bwd).

Why: the XLA path (``conv_stem.stem_pool_s2d`` after ``MaskedBatchNorm`` +
relu) materializes ~7 full-tensor elementwise fusions plus pred winner-masks
for the backward — ~20 ms of the 68 ms flagship step, all HBM-bound traffic
over [B, 320, 320, 256] tensors (trace: scripts/profile_backbone.py). The
fused kernel reads the conv output once and writes the pooled map once;
the backward recomputes winners instead of loading saved masks.

Math (one output element; reference ``/root/reference/models.py:49-51``'s
``maxpool(relu(bn(conv(x))))``):

    pooled[b, i, j, f] = relu( max_{9 taps} ( ys[tap] * scale4[c] + shift4[c] ) )

where ys is the stem conv's s2d(2) output [B, U, V, 4*O] with channel order
(ey, ex, f) (``conv_stem.stem_conv_s2d``). The 3x3/2 pool's nine taps for
output (i, j) form a *product set per phase*: phase (ey, ex) contributes
rows {i-1, i} if ey else {i}, cols {j-1, j} if ex else {j}. The max over
taps therefore factorizes into three cheap stages, each full-width over the
4*O lanes (no per-phase lane slicing):

  1. col-max   zc  = where(ex_lane, max(z, colshift(z)), z)   - one sublane
     roll (f32: ``pltpu.roll`` is 32-bit-only here) + select;
  2. row-max   zrc = where(ey_lane, max(zc[s+1], zc[s]), zc[s+1]) - leading-
     dim slices on the halo'd slab, alignment-free;
  3. phase-max m   = 2 lane-rolls (by 128 then 64) + maxes, leaving every
     lane holding its f-channel's 9-tap max; the output is lanes [0, O).

relu commutes with max (both monotone), so the kernel maxes the *pre-relu*
affine values (boundary pads = -inf) and applies one relu at the end —
bit-identical to relu-then-max with zero pads.

Backward: winners are recomputed hierarchically (phase-level: lowest group
index attaining the max; row/col level: the shifted candidate on ties, i.e.
``>=``), gradient flows only where the pooled max is > 0 (relu'), and the
routed gradient is un-shifted back through the same three stages. The tie
order differs from ``jnp.maximum``-chain autodiff only at exact float ties
(measure zero on continuous data; tests use tie-free inputs).

d(scale4)/d(shift4) are accumulated in-kernel as per-(batch, tile) partials
and reduced outside; d(ys) gets the routed gradient times scale4.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38  # effectively -inf in f32, finite to keep bf16 cast clean


def _affine(slab, scale_ref, shift_ref):
    return slab.astype(jnp.float32) * scale_ref[0] + shift_ref[0]


def _lane_masks(shape, o):
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    g = lane // o
    return (g % 2) == 1, g >= 2  # ex_lane, ey_lane


def _colshift(z):
    """z[:, j, :] <- z[:, j-1, :] with column 0 set to -inf (pool pad)."""
    zr = pltpu.roll(z, 1, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    return jnp.where(col == 0, _NEG, zr)


def _fwd_kernel(ys_ref, prev_ref, scale_ref, shift_ref, out_ref,
                *, tu, o):
    """ys_ref: the tile's [1, tu, v, c4] block; prev_ref: the single row
    above it (clamped at the top edge), both auto-pipelined by Pallas —
    this replaces the round-1 manual halo DMA, which serialized transfer
    and compute."""
    ti = pl.program_id(1)
    slab = jnp.concatenate([prev_ref[0], ys_ref[0]], axis=0)  # [tu+1, v, c4]

    z = _affine(slab, scale_ref, shift_ref)
    # Halo row 0 is the previous tile's last row; for tile 0 it is the
    # pool's top padding -> -inf (post-affine: relu(shift) must not leak).
    row = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
    z = jnp.where((row == 0) & (ti == 0), _NEG, z)

    ex_lane, _ = _lane_masks(z.shape, o)
    zc = jnp.where(ex_lane, jnp.maximum(z, _colshift(z)), z)
    a = zc[1 : tu + 1]
    # Masks are rebuilt at each consumer's shape: slicing an iota-derived
    # (replicated-layout) value crashes Mosaic's vector layout pass.
    _, ey_lane_a = _lane_masks(a.shape, o)
    zrc = jnp.where(ey_lane_a, jnp.maximum(a, zc[0:tu]), a)
    p = jnp.maximum(zrc, pltpu.roll(zrc, 2 * o, 2))
    p = jnp.maximum(p, pltpu.roll(p, o, 2))
    out_ref[0] = jnp.maximum(p[..., 0:o], 0.0).astype(out_ref.dtype)


def _bwd_kernel(ys_ref, prev_ref, next_ref, g_lo_ref, g_hi_ref,
                scale_ref, shift_ref, dys_ref, dsc_ref, dsh_ref,
                *, tu, o, n_tiles):
    ti = pl.program_id(1)
    last = n_tiles - 1
    slab = jnp.concatenate(
        [prev_ref[0], ys_ref[0], next_ref[0]], axis=0
    )  # [tu+2, v, c4]; edge rows are clamped copies, masked to -inf below

    # Recompute the pooled max for outputs s in [0, tu] (rows i0..i0+tu).
    z = _affine(slab, scale_ref, shift_ref)
    row = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
    z = jnp.where((row == 0) & (ti == 0), _NEG, z)
    z = jnp.where((row == tu + 1) & (ti == last), _NEG, z)

    c4 = z.shape[-1]
    ex_lane, _ = _lane_masks(z.shape, o)
    zroll = _colshift(z)
    colsel = ex_lane & (zroll >= z)  # shifted col candidate (j-1) wins ties
    zc = jnp.where(colsel, zroll, z)
    a = zc[1 : tu + 2]
    b = zc[0 : tu + 1]
    _, ey_lane_a = _lane_masks(a.shape, o)
    rowsel = ey_lane_a & (b >= a)  # shifted row candidate (i-1) wins ties
    zrc = jnp.where(rowsel, b, a)  # [tu+1, V, 4*O]
    m = jnp.maximum(zrc, pltpu.roll(zrc, 2 * o, 2))
    m = jnp.maximum(m, pltpu.roll(m, o, 2))

    # Phase winner: the lowest group index attaining the max. Mosaic can't
    # rotate i1 vectors, so roll a f32 indicator instead of the bool.
    eq = zrc >= m  # == m (m is the max)
    eqf = jnp.where(eq, 1.0, 0.0)
    lane = jax.lax.broadcasted_iota(jnp.int32, eq.shape, 2)
    grp = lane // o
    taken = jnp.zeros(eq.shape, jnp.bool_)
    for k in (1, 2, 3):
        taken = taken | ((pltpu.roll(eqf, k * o, 2) > 0.5) & (grp >= k))
    sel = eq & ~taken

    # g rows [i0, i0+tu] from the tile's own block plus the next block's
    # first row (the O-lane-minor array cannot be halo-DMA'd: HBM slices
    # must be 128-lane-tile aligned). For the last tile the "next" block
    # aliases itself -> mask the nonexistent halo output row.
    gfull = jnp.concatenate(
        [g_lo_ref[0], g_hi_ref[0]], axis=0
    ).astype(jnp.float32)
    row_g = jax.lax.broadcasted_iota(jnp.int32, gfull.shape, 0)
    gfull = jnp.where((row_g == tu) & (ti == last), 0.0, gfull)
    grep = jnp.concatenate([gfull] * (c4 // o), axis=-1)

    G = jnp.where(sel & (m > 0.0), grep, 0.0)  # routed, [tu+1, V, 4*O]

    # Un-route rows: a-side (u = i) to slab row s+1, b-side (u = i-1) to s.
    ga = jnp.where(rowsel, 0.0, G)
    gb = jnp.where(rowsel, G, 0.0)
    zrow = jnp.zeros((1,) + G.shape[1:], jnp.float32)
    dzc = (
        jnp.concatenate([zrow, ga], axis=0)
        + jnp.concatenate([gb, zrow], axis=0)
    )  # [tu+2, V, 4*O]
    # Un-route cols: contributions picked via colsel live at zc col j and
    # belong to z col j-1.
    back = pltpu.roll(jnp.where(colsel, dzc, 0.0), dzc.shape[1] - 1, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, dzc.shape, 1)
    back = jnp.where(col == dzc.shape[1] - 1, 0.0, back)
    dpre = (jnp.where(colsel, 0.0, dzc) + back)[1 : tu + 1]

    x = slab[1 : tu + 1].astype(jnp.float32)
    # Partial-sum blocks are (1, 1, 8, c4) to satisfy the (8, 128) tile
    # minimum; only row 0 carries data.
    pad = jnp.zeros((1, 1, 7, c4), jnp.float32)
    dsc_ref[...] = jnp.concatenate(
        [jnp.sum(dpre * x, axis=(0, 1)).reshape(1, 1, 1, c4), pad], axis=2
    )
    dsh_ref[...] = jnp.concatenate(
        [jnp.sum(dpre, axis=(0, 1)).reshape(1, 1, 1, c4), pad], axis=2
    )
    dys_ref[0] = (dpre * scale_ref[0]).astype(dys_ref.dtype)


def _pick_tu(u: int, v: int = 320) -> int:
    """Largest row-tile that keeps the backward's live vector set inside
    VMEM. The bwd holds ~8-10 slab-sized f32 SSA values of shape
    [tu+2, v, c4]; (tu+2)*v = 10880 (tu=32, v=320, the flagship) is a
    measured fit, while 21760 (v=640, the 2560px stretch config) spilled
    123 MB of vector registers. Budget just above the known-good point.

    The budget is on-chip-calibrated, not derived; ``COVA_BN_POOL_TU``
    overrides the choice for new geometries/compilers without a code
    change (same escape hatch as ``COVA_ROI_CB``). 0 disables the kernel
    (fall back to the unfused XLA path). On a compile-time VMEM OOM,
    ``ops.vmem_fallback`` shrinks ``_TU_BUDGET`` and retries instead of
    crashing.
    """
    env = os.environ.get("COVA_BN_POOL_TU")
    if env is not None:
        tu = int(env)
        if tu <= 0:
            return 0
        if u % tu != 0 or u // tu < 2:
            raise ValueError(
                f"COVA_BN_POOL_TU={tu} does not tile u={u} (need u % tu == 0"
                " and >= 2 tiles)"
            )
        return tu
    for tu in (32, 16, 8):
        if u % tu == 0 and u // tu >= 2 and (tu + 2) * v <= _TU_BUDGET:
            return tu
    return 0


# Calibrated live-vector budget for _pick_tu; mutable for the compile-OOM
# fallback (a smaller budget forces smaller tu, eventually tu=0 = the
# always-correct unfused XLA path).
_TU_BUDGET = 11000


def tu_budget() -> int:
    return _TU_BUDGET


def shrink_tu_budget(factor: int = 2) -> int:
    global _TU_BUDGET
    _TU_BUDGET = max(1, _TU_BUDGET // factor)
    return _TU_BUDGET


def _fwd_impl(ys, scale4, shift4, tu, interpret):
    b, u, v, c4 = ys.shape
    o = c4 // 4
    n_tiles = u // tu
    grid = (b, n_tiles)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, tu=tu, o=o),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tu, v, c4), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, v, c4),
                lambda bi, ti: (bi, jnp.maximum(ti * tu - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, c4), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c4), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tu, v, o), lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, u, v, o), ys.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        name="bn_pool_fwd",
        interpret=interpret,
    )(ys, ys, scale4.reshape(1, c4), shift4.reshape(1, c4))


def _bwd_impl(ys, scale4, shift4, g, tu, interpret):
    b, u, v, c4 = ys.shape
    o = c4 // 4
    n_tiles = u // tu
    grid = (b, n_tiles)
    dys, dsc, dsh = pl.pallas_call(
        functools.partial(_bwd_kernel, tu=tu, o=o, n_tiles=n_tiles),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tu, v, c4), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, v, c4),
                lambda bi, ti: (bi, jnp.maximum(ti * tu - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, v, c4),
                lambda bi, ti: (bi, jnp.minimum(ti * tu + tu, u - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, tu, v, o), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, v, o),
                lambda bi, ti: (bi, jnp.minimum(ti * tu + tu, u - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, c4), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c4), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tu, v, c4), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, c4), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, c4), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, u, v, c4), ys.dtype),
            jax.ShapeDtypeStruct((b, n_tiles, 8, c4), jnp.float32),
            jax.ShapeDtypeStruct((b, n_tiles, 8, c4), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        name="bn_pool_bwd",
        interpret=interpret,
    )(ys, ys, ys, g, g, scale4.reshape(1, c4), shift4.reshape(1, c4))
    return dys, dsc.sum(axis=(0, 1, 2)), dsh.sum(axis=(0, 1, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bn_relu_pool_s2d_fused(ys, scale4, shift4, tu, interpret=False):
    """relu(3x3/2-maxpool(ys * scale4 + shift4)) on the s2d(2) stem layout.

    ys: [B, U, V, 4*O] bf16/f32, channel order (ey, ex, f);
    scale4, shift4: [4*O] f32 (per-channel affine, phases pre-tiled).
    Returns [B, U, V, O] in ys.dtype — the stride-4 stem feature map.
    """
    return _fwd_impl(ys, scale4, shift4, tu, interpret)


def _vjp_fwd(ys, scale4, shift4, tu, interpret):
    return _fwd_impl(ys, scale4, shift4, tu, interpret), (ys, scale4, shift4)


def _vjp_bwd(tu, interpret, res, g):
    ys, scale4, shift4 = res
    return _bwd_impl(ys, scale4, shift4, g, tu, interpret)


bn_relu_pool_s2d_fused.defvjp(_vjp_fwd, _vjp_bwd)


def use_fused_pool() -> bool:
    """Gate for the fused stem pool path. Default: on for the TPU backend
    (compiled), off elsewhere. ``COVA_FUSED_POOL=0`` forces off;
    ``COVA_FUSED_POOL=1`` forces on (interpret mode off-TPU — slow, for
    tests)."""
    import os

    v = os.environ.get("COVA_FUSED_POOL", "auto")
    if v == "0":
        return False
    if v == "1":
        return True
    return jax.default_backend() == "tpu"


def bn_relu_pool_supported(ys_shape) -> bool:
    b, u, v, c4 = ys_shape
    return c4 % 4 == 0 and v % 8 == 0 and _pick_tu(u, v) > 0


def bn_relu_pool_s2d(ys, scale, shift, interpret: bool | None = None):
    """Fused normalize+relu+pool. scale/shift: [O] f32 effective affine
    (gamma*rsqrt(var+eps), beta - mean*that). Falls back to the XLA path
    (``stem_pool_s2d``) when the kernel does not support the geometry."""
    b, u, v, c4 = ys.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tu = _pick_tu(u, v)
    if not bn_relu_pool_supported(ys.shape):
        from .conv_stem import stem_pool_s2d

        z = ys.astype(jnp.float32) * jnp.tile(scale, 4) + jnp.tile(shift, 4)
        z = jnp.maximum(z, 0.0).astype(ys.dtype)
        return stem_pool_s2d(z)
    scale4 = jnp.tile(scale.astype(jnp.float32), 4)
    shift4 = jnp.tile(shift.astype(jnp.float32), 4)
    return bn_relu_pool_s2d_fused(ys, scale4, shift4, tu, interpret)
