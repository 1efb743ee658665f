"""Pallas TPU kernel for RoI max-pooling (forward + backward).

The XLA sparse-table formulation (``roi_pool.py``) is correct but
gather-bound (~17 ms for a B=8 flagship batch — row gathers lower to
thousands of tiny DMAs). This kernel keeps each image's feature map resident
in VMEM and walks each box's bin rows directly, so the work is proportional
to the *actual* box sizes instead of full-map masked reductions.

Layout (chosen so no op needs a lane<->sublane reshape, which Mosaic cannot
lower): the feature map is fed as ``[B, n_cb, H, cb, W]`` — channels in
sublanes, W in lanes; pooled outputs/gradients as ``[B, n_cb, P, cb,
out_h*out_w]``. Per (image, channel-block) program:

  * for every box and bin-row, an 8-row-chunked, row-masked running max over
    ``[8, cb, W]`` slabs -> ``[cb, W]`` accumulators;
  * one column(lane)-masked reduction per output column -> ``[cb]`` sublane
    vectors written straight into the output block;
  * bin bounds (identical integer semantics to ``roi_pool.py``; invalid
    boxes forced empty so padding costs nothing) are precomputed in jnp and
    scalar-prefetched to SMEM;
  * backward re-walks the bins and scatters ``g`` where ``fm == pooled``
    (ties receive the gradient jointly; torch's kernel picks the first
    argmax — indistinguishable in training).

Semantics match ``torchvision.ops.roi_pool`` (quantization, inclusive-end
widths, empty bins -> 0); see ``roi_pool.py`` for the rules and citations.

Two-pass backward: TRIED AND REJECTED (round 2, measured on v5e). A
variant that saved per-(box, bin, channel) argmax indices in the forward
and expanded them to one-hot adds in the backward measured fwd 12.7 ms /
fwd+bwd 24.7 ms at B=8 vs this kernel's 4.4 / 15.6: the kernel is VPU- and
loop-bound, not memory-bound, so dropping the fm re-read bought nothing
while the forward's argmax tracking (~2x the per-chunk vector ops) and the
idx output block (int32, +VMEM, forcing cb 32->16) cost plenty. Don't
retry index materialization; only a formulation that cuts the per-(box,
bin) [8, cb, W]-sized vector work would move this op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_pool import _bin_bounds, _quantize

_CHUNK = 8  # rows per masked-max step


def _bounds(boxes, box_mask, spatial_scale, out_h, out_w, h, w):
    """Packed per-box bin bounds, [B, P * (2*out_h + 2*out_w)] int32.

    Per-box layout: [ylo_0..ylo_oh, yhi_0.., xlo_0..xlo_ow, xhi_0..] —
    packed flat because SMEM scalar-prefetch pads the minor dimension to a
    full lane tile (a [B, P, 3] operand would occupy 128/3 x its size and
    blow the 1 MB SMEM budget). Invalid boxes become empty bins.
    """
    x1 = _quantize(boxes[..., 0], spatial_scale)
    y1 = _quantize(boxes[..., 1], spatial_scale)
    x2 = _quantize(boxes[..., 2], spatial_scale)
    y2 = _quantize(boxes[..., 3], spatial_scale)
    roi_w = jnp.maximum(x2 - x1 + 1, 1)
    roi_h = jnp.maximum(y2 - y1 + 1, 1)
    ylo, yhi = jax.vmap(lambda s, l: _bin_bounds(s, l, out_h, h))(y1, roi_h)
    xlo, xhi = jax.vmap(lambda s, l: _bin_bounds(s, l, out_w, w))(x1, roi_w)
    if box_mask is not None:
        valid = box_mask[..., None]
        yhi = jnp.where(valid, yhi, ylo)  # empty rows -> skipped entirely
        xhi = jnp.where(valid, xhi, xlo)
    packed = jnp.concatenate([ylo, yhi, xlo, xhi], axis=-1)  # [B, P, 2oh+2ow]
    b, p, s = packed.shape
    return packed.reshape(b, p * s)


def _fwd_kernel(
    bounds_s, fm_ref, out_ref, *, h, w, cb, out_h, out_w
):
    """fm_ref: [1, 1, h, cb, w] VMEM; out_ref: [1, 1, p, cb, out_h*out_w];
    bounds_s: packed [B, P*stride] SMEM (see ``_bounds``)."""
    b = pl.program_id(0)
    p_total = out_ref.shape[2]
    stride = 2 * out_h + 2 * out_w
    row_y = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, 1, 1), 0)
    col_x = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    neg = jnp.asarray(-jnp.inf, jnp.float32)

    def per_box(p, _):
        base = p * stride
        for i in range(out_h):
            lo = bounds_s[b, base + i]
            hi = bounds_s[b, base + out_h + i]
            c0 = lo // _CHUNK
            c1 = (hi + _CHUNK - 1) // _CHUNK

            def chunk_body(c, acc):
                y0 = c * _CHUNK
                slab = fm_ref[0, 0, pl.ds(y0, _CHUNK), :, :].astype(
                    jnp.float32
                )  # [_CHUNK, cb, w]
                ym = (row_y + y0 >= lo) & (row_y + y0 < hi)
                slab = jnp.where(ym, slab, neg)
                return jnp.maximum(acc, jnp.max(slab, axis=0))

            acc = jax.lax.fori_loop(
                c0, c1, chunk_body, jnp.full((cb, w), neg, jnp.float32)
            )  # [cb, w]
            empty_y = hi <= lo

            for j in range(out_w):
                xlo = bounds_s[b, base + 2 * out_h + j]
                xhi = bounds_s[b, base + 2 * out_h + out_w + j]
                xm = (col_x >= xlo) & (col_x < xhi)
                red = jnp.max(jnp.where(xm, acc, neg), axis=1)  # [cb]
                empty = empty_y | (xhi <= xlo)
                red = jnp.where(empty, jnp.zeros((), jnp.float32), red)
                out_ref[0, 0, p, :, i * out_w + j] = red.astype(
                    out_ref.dtype
                )
        return _

    jax.lax.fori_loop(0, p_total, per_box, 0)


def _bwd_kernel(
    bounds_s, fm_ref, out_ref, g_ref, dfm_ref,
    *, h, w, cb, out_h, out_w
):
    """Scatter g where fm equals the pooled max inside each bin."""
    b = pl.program_id(0)
    p_total = g_ref.shape[2]
    stride = 2 * out_h + 2 * out_w
    dfm_ref[0, 0, :, :, :] = jnp.zeros((h, cb, w), dfm_ref.dtype)
    row_y = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, 1, 1), 0)
    col_x = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)

    def per_box(p, _):
        base = p * stride
        for i in range(out_h):
            lo = bounds_s[b, base + i]
            hi = bounds_s[b, base + out_h + i]
            c0 = lo // _CHUNK
            c1 = (hi + _CHUNK - 1) // _CHUNK

            def chunk_body(c, _c):
                y0 = c * _CHUNK
                slab = fm_ref[0, 0, pl.ds(y0, _CHUNK), :, :].astype(
                    jnp.float32
                )  # [8, cb, w]
                ym = (row_y + y0 >= lo) & (row_y + y0 < hi)
                neg = jnp.asarray(-jnp.inf, jnp.float32)
                slab_rows = jnp.where(ym, slab, neg)
                add = jnp.zeros((_CHUNK, cb, w), jnp.float32)
                zero3 = jnp.zeros((_CHUNK, cb, w), jnp.float32)
                for j in range(out_w):
                    xlo = bounds_s[b, base + 2 * out_h + j]
                    xhi = bounds_s[b, base + 2 * out_h + out_w + j]
                    xm = (col_x >= xlo) & (col_x < xhi)
                    # Materialize broadcasts as f32 arithmetic: Mosaic cannot
                    # relayout mixed-rank boolean broadcast combinations.
                    pooled_b = (
                        out_ref[0, 0, p, :, i * out_w + j]
                        .astype(jnp.float32)[None, :, None]
                        + zero3
                    )
                    g_b = (
                        g_ref[0, 0, p, :, i * out_w + j]
                        .astype(jnp.float32)[None, :, None]
                        + zero3
                    )
                    slab_m = jnp.where(xm, slab_rows, neg)
                    add = add + jnp.where(slab_m == pooled_b, g_b, 0.0)
                cur = dfm_ref[0, 0, pl.ds(y0, _CHUNK), :, :]
                dfm_ref[0, 0, pl.ds(y0, _CHUNK), :, :] = cur + add.astype(
                    dfm_ref.dtype
                )
                return _c

            jax.lax.fori_loop(c0, c1, chunk_body, 0)
        return _

    jax.lax.fori_loop(0, p_total, per_box, 0)


def _fold_fm(fm: jnp.ndarray, cb: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, C//cb, H, cb, W] (channels to sublanes)."""
    b, h, w, c = fm.shape
    return fm.reshape(b, h, w, c // cb, cb).transpose(0, 3, 1, 4, 2)


def _unfold_fm(fm_t: jnp.ndarray) -> jnp.ndarray:
    """[B, n_cb, H, cb, W] -> [B, H, W, C]."""
    b, n_cb, h, cb, w = fm_t.shape
    return fm_t.transpose(0, 2, 4, 1, 3).reshape(b, h, w, n_cb * cb)


def _fold_out(t, b, p, out_h, out_w, n_cb, cb):
    """[B, P, oh, ow, C] -> [B, n_cb, P, cb, oh*ow]."""
    return (
        t.reshape(b, p, out_h * out_w, n_cb, cb)
        .transpose(0, 3, 1, 4, 2)
    )


def _unfold_out(t, b, p, out_h, out_w, n_cb, cb):
    """[B, n_cb, P, cb, oh*ow] -> [B, P, oh, ow, C]."""
    return (
        t.transpose(0, 2, 4, 1, 3)
        .reshape(b, p, out_h, out_w, n_cb * cb)
    )


def _lanes(n: int) -> int:
    """VMEM blocks round their minor (lane) dimension up to 128 — the
    pooled/gradient blocks' ohw=9 minor dim really costs 128 lanes (a 14x
    inflation that round 1's empirical "batch * 0.12 MB" fudge was papering
    over), and the slab's w=320 costs 384."""
    return ((n + 127) // 128) * 128


def _fwd_vmem_bytes(h, w, cb, p, ohw, itemsize, b, c) -> int:
    """Modeled scoped-VMEM demand of one FORWARD grid program:

      * the [h, cb, w] feature slab (double-buffered by the Pallas
        pipeline, lanes padded);
      * the pooled output block [p, cb, ohw->128];
      * the ENTIRE pooled output array: XLA stacks small pallas outputs
        whole in VMEM (S(1) in its OOM reports, unpadded size) — this is
        the term that actually scales with batch size.
    """
    return (
        2 * h * cb * _lanes(w) * itemsize
        + 2 * p * cb * _lanes(ohw) * itemsize
        + b * p * ohw * c * itemsize
    )


def _bwd_vmem_bytes(h, w, cb, p, ohw, itemsize) -> int:
    """Backward holds TWO slabs (fm in + dfm out) and two per-box blocks
    (pooled + g). The whole dfm output (B x the feature map) is far too
    large for VMEM, so there is no batch term."""
    return (
        2 * (2 * h * cb * _lanes(w) * itemsize)
        + 2 * (2 * p * cb * _lanes(ohw) * itemsize)
    )


# Calibrated against observed compiles on v5e (bf16, 320x320, P=232):
#   fwd cb=32 B=8  -> model 21.6 MB, compiles;   fwd cb=32 B=32 -> 28.0, OOM
#   fwd cb=16 B=32 -> 18.3, compiles;            bwd cb=32      -> 39.0, OOM
#   bwd cb=16      -> 19.6, compiles
# (The compiler reports a 16 MB scoped limit but single-buffers some blocks
# the model double-counts, so the effective budget sits between the largest
# compiling model value, 21.6, and the smallest failing one, 22.25.)
_SCOPED_VMEM_BUDGET = int(21.8e6)


def _pick_cb(c: int, bytes_at) -> int:
    """Largest channel block whose modeled footprint fits the budget.
    COVA_ROI_CB overrides for experiments."""
    import os

    forced = os.environ.get("COVA_ROI_CB")
    if forced:
        return int(forced)
    for cb in (32, 16, 8, 4, 2, 1):
        if c % cb != 0 or cb > c:
            continue
        if bytes_at(cb) <= _SCOPED_VMEM_BUDGET:
            return cb
    return 1


def _specs(b, p, h, w, cb, out_h, out_w, n_io: int):
    fm_spec = pl.BlockSpec(
        (1, 1, h, cb, w),
        lambda bi, ci, *_: (bi, ci, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, 1, p, cb, out_h * out_w),
        lambda bi, ci, *_: (bi, ci, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return fm_spec, out_spec


def _roi_pool_fwd_impl(
    fm, boxes, box_mask, *, spatial_scale, out_h, out_w, interpret=False
):
    b, h, w, c = fm.shape
    p = boxes.shape[1]
    ohw = out_h * out_w
    cb = _pick_cb(
        c,
        lambda cb: _fwd_vmem_bytes(h, w, cb, p, ohw, fm.dtype.itemsize, b, c),
    )
    n_cb = c // cb
    bounds = _bounds(boxes, box_mask, spatial_scale, out_h, out_w, h, w)
    fm_spec, out_spec = _specs(b, p, h, w, cb, out_h, out_w, 1)
    out_t = pl.pallas_call(
        functools.partial(
            _fwd_kernel, h=h, w=w, cb=cb, out_h=out_h, out_w=out_w
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_cb),
            in_specs=[fm_spec],
            out_specs=out_spec,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, n_cb, p, cb, out_h * out_w), fm.dtype
        ),
        interpret=interpret,
    )(bounds, _fold_fm(fm, cb))
    return _unfold_out(out_t, b, p, out_h, out_w, n_cb, cb)


def _roi_pool_bwd_impl(
    fm, boxes, box_mask, pooled, g, *, spatial_scale, out_h, out_w,
    interpret=False
):
    b, h, w, c = fm.shape
    p = boxes.shape[1]
    ohw = out_h * out_w
    # Smaller channel blocks than forward: the bwd holds fm AND dfm slabs.
    cb = _pick_cb(
        c, lambda cb: _bwd_vmem_bytes(h, w, cb, p, ohw, fm.dtype.itemsize)
    )
    n_cb = c // cb
    bounds = _bounds(boxes, box_mask, spatial_scale, out_h, out_w, h, w)
    fm_spec, out_spec = _specs(b, p, h, w, cb, out_h, out_w, 3)
    dfm_t = pl.pallas_call(
        functools.partial(
            _bwd_kernel, h=h, w=w, cb=cb, out_h=out_h, out_w=out_w
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_cb),
            in_specs=[fm_spec, out_spec, out_spec],
            out_specs=fm_spec,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_cb, h, cb, w), fm.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        bounds,
        _fold_fm(fm, cb),
        _fold_out(pooled, b, p, out_h, out_w, n_cb, cb),
        _fold_out(g, b, p, out_h, out_w, n_cb, cb),
    )
    return _unfold_fm(dfm_t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def roi_pool_pallas(
    fm, boxes, box_mask, spatial_scale, out_h=3, out_w=3, interpret=False
):
    """RoIPool via the Pallas kernel.

    fm: [B, H, W, C]; boxes: [B, P, 4] x1y1x2y2 (image coords); box_mask:
    [B, P] bool or None (invalid boxes produce zeros at no cost).
    Returns [B, P, out_h, out_w, C].
    """
    return _roi_pool_fwd_impl(
        fm, boxes, box_mask, spatial_scale=spatial_scale, out_h=out_h,
        out_w=out_w, interpret=interpret,
    )


def _vjp_fwd(fm, boxes, box_mask, spatial_scale, out_h, out_w, interpret):
    pooled = _roi_pool_fwd_impl(
        fm, boxes, box_mask, spatial_scale=spatial_scale, out_h=out_h,
        out_w=out_w, interpret=interpret,
    )
    return pooled, (fm, boxes, box_mask, pooled)


def _vjp_bwd(spatial_scale, out_h, out_w, interpret, res, g):
    fm, boxes, box_mask, pooled = res
    dfm = _roi_pool_bwd_impl(
        fm, boxes, box_mask, pooled, g.astype(fm.dtype),
        spatial_scale=spatial_scale, out_h=out_h, out_w=out_w,
        interpret=interpret,
    )
    return dfm, jnp.zeros_like(boxes), None


roi_pool_pallas.defvjp(_vjp_fwd, _vjp_bwd)
