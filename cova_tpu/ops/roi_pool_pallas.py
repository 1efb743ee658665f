"""Pallas TPU kernel for RoI max-pooling (forward + backward).

The XLA sparse-table formulation (``roi_pool.py``) is correct but
gather-bound (~17 ms for a B=8 flagship batch — row gathers lower to
thousands of tiny DMAs). This kernel keeps each image's feature map resident
in VMEM and walks each box's bin rows directly, so the work is proportional
to the *actual* box sizes instead of full-map masked reductions.

Layout (chosen so no op needs a lane<->sublane reshape, which Mosaic cannot
lower): the feature map is fed as ``[B, n_cb, H, cb, W3]`` — channels in
sublanes, W in lanes padded to a 128 multiple; pooled outputs/gradients as
``[B, n_cb, P, cb, out_h*out_w]``. Per (image, channel-block) program, one
windowed single pass per box (round-2 redesign; box-size ablations showed
the round-1 per-(box, bin-row) full-width structure spent ~85% of its time
on lane tiles outside the box):

  * the row phase loops only the 128-lane windows the box's columns
    intersect (aligned dynamic slices via ``pl.multiple_of``), accumulating
    all ``out_h`` bin-rows in registers per window from 8-row-chunked,
    row-masked maxes over ``[8, cb, 128]`` slabs;
  * the per-(bin-row, bin-col) lane reductions fold into the same window
    loop -> ``[cb]`` sublane vectors written straight into the output block;
  * bin bounds (identical integer semantics to ``roi_pool.py``; invalid
    boxes forced empty) are precomputed in jnp and scalar-prefetched to
    SMEM; padded boxes short-circuit through ``pl.when`` to a zero write;
  * backward re-walks the same (window, chunk) tiles and scatters ``g``
    where ``fm == pooled`` (ties receive the gradient jointly; torch's
    kernel picks the first argmax — indistinguishable in training).

Semantics match ``torchvision.ops.roi_pool`` (quantization, inclusive-end
widths, empty bins -> 0); see ``roi_pool.py`` for the rules and citations.

bf16 in-kernel compute: TRIED AND REJECTED (round 2, measured on v5e).
Running the slab maxes in the fm dtype instead of f32 — exact for max,
half the VREG footprint on paper — measured *slower* on every box mix
(fwd 3.6 -> 3.9 ms, f+b 10.7 -> 11.1 at the bench mix): Mosaic unpacks
16-bit vectors for these select/compare chains, and the bwd's bf16
equality compare doesn't lower at all ("Invalid relayout ... replicated
in destination" on the packed-i1 result). Keep f32 compute.

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


def _unpack_bounds(bounds_s, b, p, out_h, out_w):
    """Per-box bin bounds from the packed SMEM row (see ``_bounds``) —
    shared by all three kernels so the packing layout has one consumer."""
    base = p * (2 * out_h + 2 * out_w)
    ylo = [bounds_s[b, base + i] for i in range(out_h)]
    yhi = [bounds_s[b, base + out_h + i] for i in range(out_h)]
    xlo = [bounds_s[b, base + 2 * out_h + j] for j in range(out_w)]
    xhi = [bounds_s[b, base + 2 * out_h + out_w + j] for j in range(out_w)]
    return ylo, yhi, xlo, xhi


def _store_pooled(out_ref, p, reds, ylo, yhi, xlo, xhi, out_h, out_w):
    """Write one box's bin reductions, zeroing empty (clipped) bins —
    torchvision's empty-bin rule (shared by both forward kernels)."""
    for i in range(out_h):
        empty_y = yhi[i] <= ylo[i]
        for j in range(out_w):
            empty = empty_y | (xhi[j] <= xlo[j])
            red = jnp.where(
                empty, jnp.zeros((), jnp.float32), reds[i * out_w + j]
            )
            out_ref[0, 0, p, :, i * out_w + j] = red.astype(out_ref.dtype)


def _store_zero(out_ref, p, cb, out_h, out_w):
    zero = jnp.zeros((cb,), out_ref.dtype)
    for k in range(out_h * out_w):
        out_ref[0, 0, p, :, k] = zero



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
        # Zero ALL bounds of padded boxes (not just hi=lo): the kernels'
        # whole-box short-circuit tests `yhi[out_h-1] > ylo[0]`, which is
        # unconditionally false only if padded slots are fully zeroed —
        # garbage coords in padded rows would otherwise run the window loop
        # (correct via per-bin empty checks, but wasted work).
        valid = box_mask[..., None]
        zero = jnp.zeros_like(ylo)
        ylo = jnp.where(valid, ylo, zero)
        yhi = jnp.where(valid, yhi, zero)
        xlo = jnp.where(valid, xlo, zero)
        xhi = jnp.where(valid, xhi, zero)
    packed = jnp.concatenate([ylo, yhi, xlo, xhi], axis=-1)  # [B, P, 2oh+2ow]
    b, p, s = packed.shape
    return packed.reshape(b, p * s)


def _fwd_kernel(
    bounds_s, fm_ref, out_ref, *, cb, out_h, out_w
):
    """fm_ref: [1, 1, h, cb, w3] VMEM (lanes padded to a 128 multiple);
    out_ref: [1, 1, p, cb, out_h*out_w]; bounds_s: packed [B, P*stride]
    SMEM (see ``_bounds``).

    Windowed single pass per box (the round-2 redesign; measured rationale
    in the module docstring): the row phase touches only the 128-lane
    windows the box's columns intersect — most DOM boxes span one window,
    so the per-chunk vector work drops ~3x vs full-width slabs — and all
    ``out_h`` bin-rows accumulate in one walk over the box's rows. Padded
    boxes short-circuit through ``pl.when`` to a zero write."""
    b = pl.program_id(0)
    p_total = out_ref.shape[2]
    row_y = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, 1, 1), 0)
    col_x = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    neg = jnp.asarray(-jnp.inf, jnp.float32)

    def per_box(p, carry):
        ylo, yhi, xlo, xhi = _unpack_bounds(bounds_s, b, p, out_h, out_w)
        valid = yhi[out_h - 1] > ylo[0]

        @pl.when(valid)
        def _():
            c0 = ylo[0] // _CHUNK
            c1 = (yhi[out_h - 1] + _CHUNK - 1) // _CHUNK
            w0 = xlo[0] // 128
            w1 = (xhi[out_w - 1] + 127) // 128

            def per_window(wnd, reds):
                x0 = pl.multiple_of(wnd * 128, 128)

                def chunk_body(c, accs):
                    y0 = c * _CHUNK
                    slab = fm_ref[
                        0, 0, pl.ds(y0, _CHUNK), :, pl.ds(x0, 128)
                    ].astype(jnp.float32)  # [_CHUNK, cb, 128]
                    nxt = []
                    for i in range(out_h):
                        ym = (row_y + y0 >= ylo[i]) & (row_y + y0 < yhi[i])
                        nxt.append(jnp.maximum(
                            accs[i],
                            jnp.max(jnp.where(ym, slab, neg), axis=0),
                        ))
                    return tuple(nxt)

                accs = jax.lax.fori_loop(
                    c0, c1, chunk_body,
                    tuple(jnp.full((cb, 128), neg, jnp.float32)
                          for _i in range(out_h)),
                )
                # Column phase folded into the window loop: reduce each
                # (bin-row, bin-col) over this window's lanes while the
                # accumulators are live in registers.
                nreds = []
                for i in range(out_h):
                    for j in range(out_w):
                        xm = (col_x + x0 >= xlo[j]) & (col_x + x0 < xhi[j])
                        part = jnp.max(
                            jnp.where(xm, accs[i], neg), axis=1
                        )  # [cb]
                        nreds.append(jnp.maximum(
                            reds[i * out_w + j], part
                        ))
                return tuple(nreds)

            reds = jax.lax.fori_loop(
                w0, w1, per_window,
                tuple(jnp.full((cb,), neg, jnp.float32)
                      for _k in range(out_h * out_w)),
            )
            _store_pooled(
                out_ref, p, reds, ylo, yhi, xlo, xhi, out_h, out_w
            )

        @pl.when(jnp.logical_not(valid))
        def _():
            _store_zero(out_ref, p, cb, out_h, out_w)

        return carry

    jax.lax.fori_loop(0, p_total, per_box, 0)


def _fwd_kernel_ranged(
    bounds_s, fm_ref, out_ref, m1_ref, *, h, cb, out_h, out_w,
    edge_rows=False,
):
    """Ranged-walk forward variant (``COVA_ROI_FWD=ranged``): per-program
    chunk-max pyramid + per-bin-row range decomposition.

    The walk kernel's per-box cost grows with box height: every chunk the
    box spans does ``out_h`` row-masked maxes over a full ``[_CHUNK, cb,
    128]`` slab. Here each program first reduces its resident slab to a
    chunk-max pyramid ``m1[h/_CHUNK, cb, w3]`` (one cheap VMEM-local pass),
    and each bin-row's ``[ylo, yhi)`` range then decomposes into at most
    two row-masked EDGE chunks plus a run of interior chunks folded from
    single ``[cb, 128]`` m1 rows — 8x less vector work per interior chunk,
    making per-box cost nearly height-independent. Max is idempotent, so
    edge/interior overlap (bin boundaries on chunk boundaries) and the
    duplicated edge when a bin fits one chunk are harmless; empty
    (clipped) bins produce all-false masks -> -inf -> zeroed by the store
    phase, with chunk indices clamped into range so their loads stay in
    bounds.

    Measured on chip (v5e, B=8 C=64 HW=320 P=232) this beats the plain
    walk on every box mix (numbers in ``_roi_pool_fwd_impl``), so it is
    the DEFAULT; ``COVA_ROI_FWD=walk`` restores the plain walk. The
    1-chunk-box tax (2 edge maxes per bin-row where the walk pays 1) is
    below noise. Whole chunks are guaranteed by ``_fold_fm``'s H padding
    (``_pad_h``), not by any dispatcher fallback.
    """
    b = pl.program_id(0)
    p_total = out_ref.shape[2]
    n_chunks = h // _CHUNK
    row_y = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, 1, 1), 0)
    col_x = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    neg = jnp.asarray(-jnp.inf, jnp.float32)

    def mk(c, carry):
        y0 = pl.multiple_of(c * _CHUNK, _CHUNK)
        m1_ref[pl.ds(c, 1), :, :] = jnp.max(
            fm_ref[0, 0, pl.ds(y0, _CHUNK), :, :].astype(jnp.float32),
            axis=0,
        )[None]
        return carry

    jax.lax.fori_loop(0, n_chunks, mk, 0)

    def per_box(p, carry):
        ylo, yhi, xlo, xhi = _unpack_bounds(bounds_s, b, p, out_h, out_w)
        valid = yhi[out_h - 1] > ylo[0]

        @pl.when(valid)
        def _():
            w0 = xlo[0] // 128
            w1 = (xhi[out_w - 1] + 127) // 128

            def per_window(wnd, reds):
                x0 = pl.multiple_of(wnd * 128, 128)
                nreds = list(reds)
                for i in range(out_h):
                    lo, hi = ylo[i], yhi[i]
                    ilo = (lo + _CHUNK - 1) // _CHUNK
                    ihi = hi // _CHUNK  # exclusive; <= ilo -> no-op loop

                    if edge_rows:
                        # COVA_ROI_EDGE=rows: visit only the bin's IN-BIN
                        # edge rows, one [cb, 128] load+max per row,
                        # instead of two row-masked [_CHUNK, cb, 128]
                        # slab maxes. Edge rows per bin are exactly
                        # [lo, top_hi) and [bot_lo, hi) — disjoint, and
                        # together with the interior chunks they tile
                        # the bin with no duplicate row.
                        top_hi = jnp.minimum(hi, ilo * _CHUNK)
                        bot_lo = jnp.maximum(top_hi, ihi * _CHUNK)

                        def rbody(r, a):
                            return jnp.maximum(
                                a,
                                fm_ref[
                                    0, 0, pl.ds(r, 1), :, pl.ds(x0, 128)
                                ][0].astype(jnp.float32),
                            )

                        acc = jnp.full((cb, 128), neg, jnp.float32)
                        acc = jax.lax.fori_loop(lo, top_hi, rbody, acc)
                        acc = jax.lax.fori_loop(bot_lo, hi, rbody, acc)
                    else:
                        def edge(c):
                            y0e = pl.multiple_of(c * _CHUNK, _CHUNK)
                            slab = fm_ref[
                                0, 0, pl.ds(y0e, _CHUNK), :, pl.ds(x0, 128)
                            ].astype(jnp.float32)
                            ym = (row_y + y0e >= lo) & (row_y + y0e < hi)
                            return jnp.max(jnp.where(ym, slab, neg), axis=0)

                        ct = jnp.clip(lo // _CHUNK, 0, n_chunks - 1)
                        cbm = jnp.clip((hi - 1) // _CHUNK, 0, n_chunks - 1)
                        acc = jnp.maximum(edge(ct), edge(cbm))

                    def ibody(c, a):
                        return jnp.maximum(
                            a, m1_ref[pl.ds(c, 1), :, pl.ds(x0, 128)][0]
                        )

                    acc = jax.lax.fori_loop(ilo, ihi, ibody, acc)
                    for j in range(out_w):
                        xm = (col_x + x0 >= xlo[j]) & (col_x + x0 < xhi[j])
                        part = jnp.max(jnp.where(xm, acc, neg), axis=1)
                        nreds[i * out_w + j] = jnp.maximum(
                            nreds[i * out_w + j], part
                        )
                return tuple(nreds)

            reds = jax.lax.fori_loop(
                w0, w1, per_window,
                tuple(jnp.full((cb,), neg, jnp.float32)
                      for _k in range(out_h * out_w)),
            )
            _store_pooled(
                out_ref, p, reds, ylo, yhi, xlo, xhi, out_h, out_w
            )

        @pl.when(jnp.logical_not(valid))
        def _():
            _store_zero(out_ref, p, cb, out_h, out_w)

        return carry

    jax.lax.fori_loop(0, p_total, per_box, 0)


def _bwd_kernel(
    bounds_s, fm_ref, out_ref, g_ref, dfm_ref,
    *, h, cb, out_h, out_w
):
    """Scatter g where fm equals the pooled max inside each bin.

    Same windowed single-pass structure as the forward: one walk over the
    box's (chunk, window) tiles handles all out_h*out_w bins at once, each
    compare/add running on a [_CHUNK, cb, 128] window instead of the full
    lane width. Padded boxes skip entirely (their dfm stays zero)."""
    b = pl.program_id(0)
    p_total = g_ref.shape[2]
    w3 = dfm_ref.shape[-1]
    dfm_ref[0, 0, :, :, :] = jnp.zeros((h, cb, w3), dfm_ref.dtype)
    row_y = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, 1, 1), 0)
    col_x = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
    neg = jnp.asarray(-jnp.inf, jnp.float32)
    # Outside-bin lanes carry +inf in the pre-masked pooled rows: a -inf
    # edge-masked slab row can never equal it, and neither can any finite
    # feature value, so the single equality below is exact.
    big = jnp.asarray(jnp.inf, jnp.float32)

    def per_box(p, carry):
        ylo, yhi, xlo, xhi = _unpack_bounds(bounds_s, b, p, out_h, out_w)
        valid = yhi[out_h - 1] > ylo[0]

        @pl.when(valid)
        def _():
            c0 = ylo[0] // _CHUNK
            c1 = (yhi[out_h - 1] + _CHUNK - 1) // _CHUNK
            w0 = xlo[0] // 128
            w1 = (xhi[out_w - 1] + 127) // 128
            zero2 = jnp.zeros((1, cb, 128), jnp.float32)
            # Pooled maxes / incoming grads are (chunk, window)-invariant:
            # materialize the 9 broadcast pairs once per box, as [1, cb,
            # 128] rows (the leading-dim broadcast against the [_CHUNK, ...]
            # slab is the cheap direction; only rank-MIXED bool broadcasts
            # trip Mosaic).
            pg = []
            for k in range(out_h * out_w):
                pooled_b = (
                    out_ref[0, 0, p, :, k]
                    .astype(jnp.float32)[None, :, None] + zero2
                )
                g_b = (
                    g_ref[0, 0, p, :, k]
                    .astype(jnp.float32)[None, :, None] + zero2
                )
                pg.append((pooled_b, g_b))

            def per_window(wnd, _w):
                x0 = pl.multiple_of(wnd * 128, 128)
                # Column masks are chunk-invariant: pre-mask each bin's
                # pooled row to its columns once per window (lanes outside
                # the bin get +big, which the equality can never hit), so
                # the chunk loop runs ONE compare+select per (bin-row,
                # bin-col) instead of mask+select+compare+select.
                pgm = []
                for i in range(out_h):
                    row = []
                    for j in range(out_w):
                        xm = (col_x + x0 >= xlo[j]) & (col_x + x0 < xhi[j])
                        pooled_b, g_b = pg[i * out_w + j]
                        row.append((jnp.where(xm, pooled_b, big), g_b))
                    pgm.append(row)

                def chunk_body(c, _c):
                    y0 = c * _CHUNK
                    slab = fm_ref[
                        0, 0, pl.ds(y0, _CHUNK), :, pl.ds(x0, 128)
                    ].astype(jnp.float32)  # [_CHUNK, cb, 128]
                    # Guard each bin-row's select block on chunk/bin
                    # intersection: interior chunks of a tall bin run one
                    # body instead of all nine — the dominant saving for
                    # large boxes, whose bins span many chunks. Fully-
                    # interior chunks (all _CHUNK rows inside the bin) skip
                    # the row masking entirely.
                    for i in range(out_h):
                        inside = (y0 >= ylo[i]) & (y0 + _CHUNK <= yhi[i])
                        edge = (
                            (y0 < yhi[i]) & (y0 + _CHUNK > ylo[i])
                            & jnp.logical_not(inside)
                        )

                        def accum(rows, i=i):
                            add = jnp.zeros(
                                (_CHUNK, cb, 128), jnp.float32
                            )
                            for j in range(out_w):
                                pooled_m, g_b = pgm[i][j]
                                add = add + jnp.where(
                                    rows == pooled_m, g_b, 0.0
                                )
                            cur = dfm_ref[0, 0, pl.ds(y0, _CHUNK), :,
                                          pl.ds(x0, 128)]
                            dfm_ref[
                                0, 0, pl.ds(y0, _CHUNK), :, pl.ds(x0, 128)
                            ] = cur + add.astype(dfm_ref.dtype)

                        @pl.when(inside)
                        def _(i=i):
                            accum(slab, i)

                        @pl.when(edge)
                        def _(i=i):
                            ym = (row_y + y0 >= ylo[i]) & (
                                row_y + y0 < yhi[i]
                            )
                            accum(jnp.where(ym, slab, neg), i)

                    return _c

                jax.lax.fori_loop(c0, c1, chunk_body, 0)
                return _w

            jax.lax.fori_loop(w0, w1, per_window, 0)

        return carry

    jax.lax.fori_loop(0, p_total, per_box, 0)


def _col_groups(out_w: int):
    """Column cells packed into compare-key groups whose member bins are
    column-DISJOINT-OR-IDENTICAL for every possible roi width.

    Both cases are exact under the sum-combine used below: the group's
    compare key is the pooled value of whichever member covers the lane
    (identical intervals have identical pooled maxes), and the group's
    gradient is the SUM of member gradients at that lane — which is
    precisely the joint contribution the per-cell formulation makes.
    Overlapping NON-identical members would be wrong (the later member's
    pooled value overwrites the key while both gradients are summed under
    it), and do occur: ``roi_w=2, out_w=5`` gives bins ``[0,1)`` and
    ``[0,2)`` at cells 0 and 2, so plain even/odd parity is only safe for
    ``out_w <= 4``.

    Greedy first-fit with two admission checks:
      * members at least 2 apart — adjacent bins share a column whenever
        ``(j+1)*roi_w % out_w != 0`` (floor/ceil bounds), for arbitrarily
        large widths;
      * for each ``roi_w in [1, out_w)``, exact integer bin bounds of the
        candidate vs every member are disjoint or identical. Widths
        ``>= out_w`` need no check: cells ``j < k`` with ``k-j >= 2`` have
        ``floor(k*rl/out) >= ceil((j+1)*rl/out)`` because the gap
        ``(k-j-1)*rl/out >= 1``.

    For ``out_w=3`` this reproduces the historic even/odd pair
    ``((0, 2), (1,))``; ``out_w=5`` packs to ``((0, 3), (1, 4), (2,))``.
    """
    def bins(rl):
        return [
            ((i * rl) // out_w, ((i + 1) * rl + out_w - 1) // out_w)
            for i in range(out_w)
        ]

    small = [bins(rl) for rl in range(1, out_w)]

    def compatible(a, b):
        if abs(a - b) < 2:
            return False
        for bl in small:
            if bl[a] != bl[b] and bl[a][1] > bl[b][0] and bl[b][1] > bl[a][0]:
                return False
        return True

    groups: list[list[int]] = []
    for j in range(out_w):
        for g in groups:
            if all(compatible(j, m) for m in g):
                g.append(j)
                break
        else:
            groups.append([j])
    return tuple(tuple(g) for g in groups)


def _bwd_kernel_pyramid(
    bounds_s, fm_ref, out_ref, g_ref, dfm_ref, m1_ref, gb_ref,
    *, h, cb, out_h, out_w, edge_rows=False
):
    """Pyramid-routed backward (``COVA_ROI_BWD=pyramid``): height-
    independent per-box cost, like the ranged forward.

    The walk backward's cost grows with box height: every chunk a box
    spans pays ~11 vector ops on a full ``[_CHUNK, cb, 128]`` slab. Here
    the gradient for INTERIOR chunks (all ``_CHUNK`` rows inside the bin)
    is *routed* instead of scattered directly, in three phases:

      1. a chunk-max pyramid ``m1[h/_CHUNK, cb, w3]`` (same reduction as
         the ranged forward) plus a zeroed per-chunk lane-gradient buffer
         ``gb`` of the same shape;
      2. per (box, window, bin-row): partial EDGE chunks (at most two)
         keep the direct row-masked scatter, while each interior chunk
         only accumulates ``gb[c] += where(m1[c] == pooled, g, 0)`` — a
         ``[cb, 128]``-sized op, 8x less vector work than a slab visit.
         Correctness hinges on two facts: (a) for an interior chunk,
         ``m1[c][lane] == pooled`` exactly identifies lanes whose column
         attains the bin max inside this chunk (impossible for edge
         chunks, where out-of-bin rows can dominate ``m1``); (b) every
         contribution routed to ``(c, lane)`` — any box, any cell —
         shares the same compare key ``m1[c][lane]``, so their gradients
         can be summed into one buffer and resolved to rows later;
      3. one full-width sweep per program: ``dfm[chunk] += where(slab ==
         m1[c], gb[c], 0)`` — row resolution paid ONCE per chunk,
         amortized over every box that touched it.

    Tie semantics are identical to the walk backward (every fm cell equal
    to the bin max receives the full cotangent, summed over bins); the
    oracle tests run tie-free so all variants must agree exactly.

    Column cells fold into disjoint-or-identical groups (``_col_groups``;
    even/odd parity at the default ``out_w=3``) for both the edge and
    routed paths: ~2-3 compare keys per bin-row instead of ``out_w``.
    """
    b = pl.program_id(0)
    p_total = g_ref.shape[2]
    w3 = dfm_ref.shape[-1]
    n_chunks = h // _CHUNK
    dfm_ref[0, 0, :, :, :] = jnp.zeros((h, cb, w3), dfm_ref.dtype)
    row_y = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, 1, 1), 0)
    col_x = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
    neg = jnp.asarray(-jnp.inf, jnp.float32)
    big = jnp.asarray(jnp.inf, jnp.float32)
    groups = _col_groups(out_w)

    def mk(c, carry):
        y0 = pl.multiple_of(c * _CHUNK, _CHUNK)
        m1_ref[pl.ds(c, 1), :, :] = jnp.max(
            fm_ref[0, 0, pl.ds(y0, _CHUNK), :, :].astype(jnp.float32),
            axis=0,
        )[None]
        gb_ref[pl.ds(c, 1), :, :] = jnp.zeros((1, cb, w3), jnp.float32)
        return carry

    jax.lax.fori_loop(0, n_chunks, mk, 0)

    def per_box(p, carry):
        ylo, yhi, xlo, xhi = _unpack_bounds(bounds_s, b, p, out_h, out_w)
        valid = yhi[out_h - 1] > ylo[0]

        @pl.when(valid)
        def _():
            w0 = xlo[0] // 128
            w1 = (xhi[out_w - 1] + 127) // 128
            zero2 = jnp.zeros((1, cb, 128), jnp.float32)
            pg = []
            for k in range(out_h * out_w):
                pooled_b = (
                    out_ref[0, 0, p, :, k]
                    .astype(jnp.float32)[None, :, None] + zero2
                )
                g_b = (
                    g_ref[0, 0, p, :, k]
                    .astype(jnp.float32)[None, :, None] + zero2
                )
                pg.append((pooled_b, g_b))

            def per_window(wnd, _w):
                x0 = pl.multiple_of(wnd * 128, 128)
                # Parity-grouped (compare key, summed gradient) pairs per
                # bin-row: lanes outside every member cell keep +inf keys
                # (never matched by any finite value or -inf masked row).
                grp = []
                for i in range(out_h):
                    row = []
                    for cells in groups:
                        pool_g = zero2 + big
                        g_g = zero2
                        for j in cells:
                            xm = (col_x + x0 >= xlo[j]) & (
                                col_x + x0 < xhi[j]
                            )
                            pooled_b, g_b = pg[i * out_w + j]
                            pool_g = jnp.where(xm, pooled_b, pool_g)
                            g_g = g_g + jnp.where(xm, g_b, 0.0)
                        row.append((pool_g, g_g))
                    grp.append(row)

                for i in range(out_h):
                    lo, hi = ylo[i], yhi[i]
                    nonempty = hi > lo
                    et = lo // _CHUNK
                    eb = jnp.maximum(hi - 1, 0) // _CHUNK
                    ilo = (lo + _CHUNK - 1) // _CHUNK
                    ihi = hi // _CHUNK  # exclusive interior end

                    if edge_rows:
                        # COVA_ROI_EDGE=rows: visit only the IN-BIN rows
                        # of the (up to two) partial edge chunks, one
                        # [1, cb, 128] compare+RMW per row, instead of a
                        # row-masked [_CHUNK, cb, 128] slab visit. Row
                        # ranges [lo, top_hi) and [bot_lo, hi) tile the
                        # bin exactly against the interior chunks (same
                        # decomposition as the ranged forward), so each
                        # in-bin row is visited once; accumulation
                        # semantics (direct edge adds + routed interior
                        # adds resolved by the final sweep) are
                        # unchanged.
                        top_hi = jnp.minimum(hi, ilo * _CHUNK)
                        bot_lo = jnp.maximum(top_hi, ihi * _CHUNK)

                        def rbody(r, a, i=i):
                            rowv = fm_ref[
                                0, 0, pl.ds(r, 1), :, pl.ds(x0, 128)
                            ].astype(jnp.float32)
                            add = jnp.zeros((1, cb, 128), jnp.float32)
                            for pool_g, g_g in grp[i]:
                                add = add + jnp.where(
                                    rowv == pool_g, g_g, 0.0
                                )
                            cur = dfm_ref[
                                0, 0, pl.ds(r, 1), :, pl.ds(x0, 128)
                            ]
                            dfm_ref[
                                0, 0, pl.ds(r, 1), :, pl.ds(x0, 128)
                            ] = cur + add.astype(dfm_ref.dtype)
                            return a

                        jax.lax.fori_loop(lo, top_hi, rbody, 0)
                        jax.lax.fori_loop(bot_lo, hi, rbody, 0)
                    else:
                        def edge_visit(c, i=i):
                            y0e = pl.multiple_of(c * _CHUNK, _CHUNK)
                            slab = fm_ref[
                                0, 0, pl.ds(y0e, _CHUNK), :, pl.ds(x0, 128)
                            ].astype(jnp.float32)
                            ym = (row_y + y0e >= lo) & (row_y + y0e < hi)
                            rows = jnp.where(ym, slab, neg)
                            add = jnp.zeros((_CHUNK, cb, 128), jnp.float32)
                            for pool_g, g_g in grp[i]:
                                add = add + jnp.where(
                                    rows == pool_g, g_g, 0.0
                                )
                            cur = dfm_ref[
                                0, 0, pl.ds(y0e, _CHUNK), :, pl.ds(x0, 128)
                            ]
                            dfm_ref[
                                0, 0, pl.ds(y0e, _CHUNK), :, pl.ds(x0, 128)
                            ] = cur + add.astype(dfm_ref.dtype)

                        # A chunk is an EDGE iff it intersects the bin but
                        # is not in the interior range [ilo, ihi): the top
                        # chunk whenever it is partial, the bottom chunk
                        # when it is partial AND distinct from the top (a
                        # single-chunk bin gets one visit whose row mask
                        # covers both ends).
                        top_partial = (et < ilo) | (et >= ihi)

                        @pl.when(nonempty & top_partial)
                        def _():
                            edge_visit(et)

                        bot_partial = ((eb < ilo) | (eb >= ihi)) & (eb != et)

                        @pl.when(nonempty & bot_partial)
                        def _():
                            edge_visit(eb)

                    def ibody(c, a, i=i):
                        m1r = m1_ref[pl.ds(c, 1), :, pl.ds(x0, 128)]
                        addg = jnp.zeros((1, cb, 128), jnp.float32)
                        for pool_g, g_g in grp[i]:
                            addg = addg + jnp.where(
                                m1r == pool_g, g_g, 0.0
                            )
                        gb_ref[pl.ds(c, 1), :, pl.ds(x0, 128)] = (
                            gb_ref[pl.ds(c, 1), :, pl.ds(x0, 128)] + addg
                        )
                        return a

                    jax.lax.fori_loop(ilo, ihi, ibody, 0)
                return _w

            jax.lax.fori_loop(w0, w1, per_window, 0)

        return carry

    jax.lax.fori_loop(0, p_total, per_box, 0)

    def scatter(c, carry):
        y0 = pl.multiple_of(c * _CHUNK, _CHUNK)
        slab = fm_ref[0, 0, pl.ds(y0, _CHUNK), :, :].astype(jnp.float32)
        m1r = m1_ref[pl.ds(c, 1), :, :]
        gr = gb_ref[pl.ds(c, 1), :, :]
        add = jnp.where(slab == m1r, gr, 0.0)
        cur = dfm_ref[0, 0, pl.ds(y0, _CHUNK), :, :]
        dfm_ref[0, 0, pl.ds(y0, _CHUNK), :, :] = (
            cur + add.astype(dfm_ref.dtype)
        )
        return carry

    jax.lax.fori_loop(0, n_chunks, scatter, 0)


def _pad_h(h: int) -> int:
    """Round H up to a whole number of row chunks: the kernels' chunk
    loads are ``pl.ds(c * _CHUNK, _CHUNK)``, which would silently CLAMP
    (dynamic-slice semantics — duplicating rows under a mislabeled row
    mask) at the last partial chunk of an h % _CHUNK != 0 map. Bin bounds
    are clamped to the TRUE h, so no mask ever selects a padded row."""
    return ((h + _CHUNK - 1) // _CHUNK) * _CHUNK


def _fold_fm(fm: jnp.ndarray, cb: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, C//cb, Hp, cb, W3] (channels to sublanes; H
    zero-padded to a whole chunk count and W to a 128-lane multiple so the
    kernels' aligned dynamic slices stay in bounds)."""
    b, h, w, c = fm.shape
    t = fm.reshape(b, h, w, c // cb, cb).transpose(0, 3, 1, 4, 2)
    pad_w = _lanes(w) - w
    pad_h = _pad_h(h) - h
    if pad_w or pad_h:
        t = jnp.pad(t, ((0, 0), (0, 0), (0, pad_h), (0, 0), (0, pad_w)))
    return t


def _unfold_fm(fm_t: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[B, n_cb, Hp, cb, W3] -> [B, H, W, C] (drops the row/lane padding)."""
    b, n_cb, _hp, cb, _w3 = fm_t.shape
    return (
        fm_t[:, :, :h, :, :w]
        .transpose(0, 2, 4, 1, 3)
        .reshape(b, h, w, n_cb * cb)
    )


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


def _fwd_vmem_bytes(h, w, cb, p, ohw, itemsize, b, c, ranged=False) -> int:
    """Modeled scoped-VMEM demand of one FORWARD grid program:

      * the [h, cb, w] feature slab (double-buffered by the Pallas
        pipeline, lanes padded);
      * the pooled output block [p, cb, ohw->128];
      * the ENTIRE pooled output array: XLA stacks small pallas outputs
        whole in VMEM (S(1) in its OOM reports, unpadded size) — this is
        the term that actually scales with batch size;
      * the ranged variant's f32 chunk-max pyramid scratch
        [h/_CHUNK, cb, w3] (not double-buffered: scratch, not pipelined).
    """
    return (
        2 * h * cb * _lanes(w) * itemsize
        + 2 * p * cb * _lanes(ohw) * itemsize
        + b * p * ohw * c * itemsize
        + (h // _CHUNK) * cb * _lanes(w) * 4 * (1 if ranged else 0)
    )


def _bwd_vmem_bytes(h, w, cb, p, ohw, itemsize, pyramid=False) -> int:
    """Backward holds TWO slabs (fm in + dfm out) and two per-box blocks
    (pooled + g), each double-buffered. The whole dfm output (B x the
    feature map) is far too large for VMEM, so there is no batch term.
    The pyramid variant adds two f32 [h/_CHUNK, cb, w3] scratch buffers
    (chunk maxes + routed lane gradients; scratch, not double-buffered)."""
    return (
        2 * (2 * h * cb * _lanes(w) * itemsize)
        + 2 * (2 * p * cb * _lanes(ohw) * itemsize)
        + 2 * (h // _CHUNK) * cb * _lanes(w) * 4 * (1 if pyramid else 0)
    )


# Re-calibrated for the round-2 windowed kernels (both pallas_calls now
# request vmem_limit_bytes=100 MB; the old kernels' full-width per-chunk
# SSA values also spilled vector registers on top of the blocks, which is
# why round 1's effective budget was only ~22 MB). Observed on v5e (bf16,
# 320x320, P=232): bwd cb=64 -> model 78 MB, compiles and is the fastest
# (one program per image halves the per-box scalar overhead); fwd cb=64
# at B=32 -> 47.6 MB, compiles. The 2560px stretch config (h=640, lanes
# 768) correctly falls back: bwd cb=64 would model 252 MB -> picks 16.
#
# The budget is calibrated, not derived — at an unanchored geometry the
# compiler may still OOM. It is therefore MUTABLE: ``ops.vmem_fallback``
# shrinks it and recompiles instead of crashing (VERDICT r2 item 7), and
# ``COVA_ROI_VMEM_BUDGET`` pins it from the environment. Round 4: raised
# 85e6 -> 93e6 so the pyramid backward's +7.9 MB scratch keeps the
# flagship cb=64 pick (model 86 MB; compiles under the 100 MB limit —
# verified on chip); every previously-asserted pick is unchanged.
_SCOPED_VMEM_BUDGET = int(
    float(__import__("os").environ.get("COVA_ROI_VMEM_BUDGET", 93e6))
)


def vmem_budget() -> int:
    return _SCOPED_VMEM_BUDGET


def shrink_vmem_budget(factor: int = 2) -> int:
    """Halve the modeled-VMEM budget (compile-OOM fallback); returns the
    new value. Takes effect at the next trace (callers must clear jit
    caches — see ``ops.vmem_fallback.with_vmem_fallback``)."""
    global _SCOPED_VMEM_BUDGET
    _SCOPED_VMEM_BUDGET = max(1, _SCOPED_VMEM_BUDGET // factor)
    return _SCOPED_VMEM_BUDGET


def _pick_cb(c: int, bytes_at) -> int:
    """Largest channel block whose modeled footprint fits the budget.
    COVA_ROI_CB overrides for experiments."""
    import os

    forced = os.environ.get("COVA_ROI_CB")
    if forced:
        cb = int(forced)
        if cb < 1 or c % cb != 0:
            raise ValueError(
                f"COVA_ROI_CB={cb} must be a positive divisor of the "
                f"channel count {c} (the fold step reshapes C into "
                f"C//cb blocks)"
            )
        return cb
    for cb in (64, 32, 16, 8, 4, 2, 1):
        if c % cb != 0 or cb > c:
            continue
        if bytes_at(cb) <= _SCOPED_VMEM_BUDGET:
            return cb
    return 1


def _specs(b, p, h, w, cb, out_h, out_w):
    fm_spec = pl.BlockSpec(
        (1, 1, h, cb, _lanes(w)),
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
    import os

    b, h, w, c = fm.shape
    p = boxes.shape[1]
    ohw = out_h * out_w
    hp = _pad_h(h)  # kernels see whole chunks; bounds clamp to the true h
    # Ranged-walk forward (chunk-max pyramid; see _fwd_kernel_ranged) is the
    # default: measured on chip at B=8 C=64 HW=320 P=232 it beats the plain
    # walk on every box mix — small 3.14->3.01 ms, real 5.03->3.29, tall
    # 15.06->4.46 (fwd+bwd 7.40->7.31 / 13.46->11.69 / 44.82->34.20) — the
    # 2-edge-max tax on 1-chunk boxes is below noise while the interior
    # fold's 8x less vector work wins everywhere else. COVA_ROI_FWD=walk
    # restores the plain walk.
    ranged = os.environ.get("COVA_ROI_FWD", "ranged") == "ranged"
    # COVA_ROI_EDGE: per-row edge treatment (the round-4 "cheaper edge-
    # chunk" lever). Measured on chip (v5e, B=8 C=64 HW=320 P=232,
    # artifacts/tpu_r5/roi_edge_ab.out): FORWARD is neutral-to-negative
    # (small 2.99->2.87, real 3.32->3.28, tall 4.40->4.49 ms — the row
    # loop's per-iteration overhead beats the vectorized slab max once
    # edges near _CHUNK rows), so the forward default stays "slab"; the
    # BACKWARD wins 15-18% on every mix, so its default is "rows" (see
    # _roi_pool_bwd_impl). An explicit env value applies to both.
    edge_rows = os.environ.get("COVA_ROI_EDGE", "slab") == "rows"
    cb = _pick_cb(
        c,
        lambda cb: _fwd_vmem_bytes(
            hp, w, cb, p, ohw, fm.dtype.itemsize, b, c, ranged=ranged
        ),
    )
    n_cb = c // cb
    bounds = _bounds(boxes, box_mask, spatial_scale, out_h, out_w, h, w)
    fm_spec, out_spec = _specs(b, p, hp, w, cb, out_h, out_w)
    kernel = _fwd_kernel_ranged if ranged else _fwd_kernel
    scratch = (
        [pltpu.VMEM((hp // _CHUNK, cb, _lanes(w)), jnp.float32)]
        if ranged else []
    )
    out_t = pl.pallas_call(
        functools.partial(
            kernel,
            cb=cb, out_h=out_h, out_w=out_w,
            **({"h": hp, "edge_rows": edge_rows} if ranged else {}),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_cb),
            in_specs=[fm_spec],
            out_specs=out_spec,
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, n_cb, p, cb, out_h * out_w), fm.dtype
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        name="roi_pool_fwd_ranged" if ranged else "roi_pool_fwd",
        interpret=interpret,
    )(bounds, _fold_fm(fm, cb))
    return _unfold_out(out_t, b, p, out_h, out_w, n_cb, cb)


def _roi_pool_bwd_impl(
    fm, boxes, box_mask, pooled, g, *, spatial_scale, out_h, out_w,
    interpret=False
):
    import os

    b, h, w, c = fm.shape
    p = boxes.shape[1]
    ohw = out_h * out_w
    hp = _pad_h(h)
    # Pyramid-routed backward (see _bwd_kernel_pyramid) is the default:
    # measured on chip at B=8 C=64 HW=320 P=232 it beats the walk on the
    # tall-heavy mixes that dominate training cost (numbers alongside the
    # fwd measurements above). COVA_ROI_BWD=walk restores the plain walk.
    pyramid = os.environ.get("COVA_ROI_BWD", "pyramid") == "pyramid"
    # Backward edge default is "rows": measured fwd+bwd on chip
    # (artifacts/tpu_r5/roi_edge_ab.out) — small 6.48->5.31, real
    # 7.34->6.06, tall 11.17->9.55 ms — per-row edge visits beat the
    # row-masked slab RMW on every box mix (the bwd slab visit pays a
    # full [_CHUNK, cb, 128] read+compare+write; most bins have 1-3
    # in-bin edge rows). See the forward impl's note for why the fwd
    # default differs.
    edge_rows = os.environ.get("COVA_ROI_EDGE", "rows") == "rows"
    # Smaller channel blocks than forward: the bwd holds fm AND dfm slabs.
    cb = _pick_cb(
        c, lambda cb: _bwd_vmem_bytes(
            hp, w, cb, p, ohw, fm.dtype.itemsize, pyramid=pyramid
        )
    )
    n_cb = c // cb
    bounds = _bounds(boxes, box_mask, spatial_scale, out_h, out_w, h, w)
    fm_spec, out_spec = _specs(b, p, hp, w, cb, out_h, out_w)
    kernel = _bwd_kernel_pyramid if pyramid else _bwd_kernel
    scratch = (
        [
            pltpu.VMEM((hp // _CHUNK, cb, _lanes(w)), jnp.float32),
            pltpu.VMEM((hp // _CHUNK, cb, _lanes(w)), jnp.float32),
        ]
        if pyramid else []
    )
    dfm_t = pl.pallas_call(
        functools.partial(
            kernel, h=hp, cb=cb, out_h=out_h, out_w=out_w,
            **({"edge_rows": edge_rows} if pyramid else {}),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_cb),
            in_specs=[fm_spec, out_spec, out_spec],
            out_specs=fm_spec,
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, n_cb, hp, cb, _lanes(w)), fm.dtype
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        name="roi_pool_bwd_pyramid" if pyramid else "roi_pool_bwd",
        interpret=interpret,
    )(
        bounds,
        _fold_fm(fm, cb),
        _fold_out(pooled, b, p, out_h, out_w, n_cb, cb),
        _fold_out(g, b, p, out_h, out_w, n_cb, cb),
    )
    return _unfold_fm(dfm_t, h, w)


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
