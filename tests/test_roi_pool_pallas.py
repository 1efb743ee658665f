"""Pallas RoIPool kernel (interpret mode on CPU) vs the numpy oracle and
the XLA implementation, forward and backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cova_tpu.ops.roi_pool import roi_pool, roi_pool_reference
from cova_tpu.ops.roi_pool_pallas import roi_pool_pallas


def _case(rng, B=2, H=16, W=16, C=8, P=10, img=64):
    fm = rng.normal(size=(B, H, W, C)).astype(np.float32)
    x1 = rng.uniform(0, img - 4, (B, P))
    y1 = rng.uniform(0, img - 4, (B, P))
    x2 = x1 + rng.uniform(0.5, img - x1)
    y2 = y1 + rng.uniform(0.5, img - y1)
    boxes = np.stack([x1, y1, x2, y2], -1).astype(np.float32)
    mask = np.ones((B, P), bool)
    return fm, boxes, mask


@pytest.mark.parametrize("seed", [0, 1])
def test_forward_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    fm, boxes, mask = _case(rng)
    got = np.asarray(
        roi_pool_pallas(
            jnp.asarray(fm), jnp.asarray(boxes), jnp.asarray(mask),
            0.25, 3, 3, True,
        )
    )
    want = roi_pool_reference(fm, boxes, spatial_scale=0.25)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_masked_boxes_are_zero_and_cheap():
    rng = np.random.default_rng(2)
    fm, boxes, mask = _case(rng)
    mask[:, 5:] = False
    got = np.asarray(
        roi_pool_pallas(
            jnp.asarray(fm), jnp.asarray(boxes), jnp.asarray(mask),
            0.25, 3, 3, True,
        )
    )
    want = roi_pool_reference(fm, boxes, spatial_scale=0.25)
    np.testing.assert_allclose(got[:, :5], want[:, :5], rtol=1e-6)
    assert (got[:, 5:] == 0).all()


def test_odd_channel_count_uses_smaller_blocks():
    rng = np.random.default_rng(3)
    fm, boxes, mask = _case(rng, C=4)
    got = np.asarray(
        roi_pool_pallas(
            jnp.asarray(fm), jnp.asarray(boxes), jnp.asarray(mask),
            0.25, 3, 3, True,
        )
    )
    want = roi_pool_reference(fm, boxes, spatial_scale=0.25)
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize(
    "bwd,edge", [("walk", "slab"), ("pyramid", "slab"), ("pyramid", "rows")]
)
def test_backward_matches_xla_grad(bwd, edge, monkeypatch):
    monkeypatch.setenv("COVA_ROI_BWD", bwd)
    monkeypatch.setenv("COVA_ROI_EDGE", edge)
    rng = np.random.default_rng(4)
    fm, boxes, mask = _case(rng, B=1, P=6)
    fmj, bj, mj = jnp.asarray(fm), jnp.asarray(boxes), jnp.asarray(mask)
    g = rng.normal(size=(1, 6, 3, 3, 8)).astype(np.float32)
    gj = jnp.asarray(g)

    def loss_pallas(f):
        return jnp.sum(roi_pool_pallas(f, bj, mj, 0.25, 3, 3, True) * gj)

    def loss_xla(f):
        return jnp.sum(roi_pool(f, bj, spatial_scale=0.25) * gj)

    d_pallas = np.asarray(jax.grad(loss_pallas)(fmj))
    d_xla = np.asarray(jax.grad(loss_xla)(fmj))
    # XLA's max-grad splits evenly among ties; the kernel gives each tie the
    # full cotangent; random f32 maps have no ties, so they must agree.
    np.testing.assert_allclose(d_pallas, d_xla, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_edge_rows_forward_matches_oracle(seed, monkeypatch):
    """COVA_ROI_EDGE=rows (round-5 edge-chunk lever): per-row edge visits
    in the ranged forward must be exact — the [lo, top_hi) / [bot_lo, hi)
    row ranges tile each bin against the interior chunks with no
    duplicate and no gap. Covers sub-chunk bins (edge-only), chunk-
    aligned bins (interior-only), and bins with both."""
    monkeypatch.setenv("COVA_ROI_FWD", "ranged")
    monkeypatch.setenv("COVA_ROI_EDGE", "rows")
    rng = np.random.default_rng(seed)
    fm, boxes, mask = _case(rng, B=2, H=48, W=32, C=8, P=12, img=192)
    # Mix in chunk-aligned and tall boxes like the ranged/pyramid tests.
    boxes[0, 0] = [0, 0, 128, 188]      # tall, nearly full height
    boxes[0, 1] = [0, 32, 64, 96]       # bins land on chunk boundaries
    boxes[0, 2] = [4, 4, 10, 10]        # sub-chunk: edges only
    got = np.asarray(
        roi_pool_pallas(
            jnp.asarray(fm), jnp.asarray(boxes), jnp.asarray(mask),
            0.25, 3, 3, True,
        )
    )
    want = roi_pool_reference(fm, boxes, spatial_scale=0.25)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1])
def test_edge_rows_backward_matches_xla_grad(seed, monkeypatch):
    """COVA_ROI_EDGE=rows backward: direct per-row edge RMWs + routed
    interior adds must reproduce the XLA gradient exactly (tie-free)."""
    monkeypatch.setenv("COVA_ROI_BWD", "pyramid")
    monkeypatch.setenv("COVA_ROI_EDGE", "rows")
    rng = np.random.default_rng(10 + seed)
    fm, boxes, mask = _case(rng, B=1, H=48, W=32, C=8, P=8, img=192)
    boxes[0, 0] = [0, 0, 128, 188]
    boxes[0, 1] = [0, 32, 64, 96]
    boxes[0, 2] = [4, 4, 10, 10]
    fmj, bj, mj = jnp.asarray(fm), jnp.asarray(boxes), jnp.asarray(mask)
    g = rng.normal(size=(1, 8, 3, 3, 8)).astype(np.float32)
    gj = jnp.asarray(g)

    def loss_pallas(f):
        return jnp.sum(roi_pool_pallas(f, bj, mj, 0.25, 3, 3, True) * gj)

    def loss_xla(f):
        return jnp.sum(roi_pool(f, bj, spatial_scale=0.25) * gj)

    d_pallas = np.asarray(jax.grad(loss_pallas)(fmj))
    d_xla = np.asarray(jax.grad(loss_xla)(fmj))
    np.testing.assert_allclose(d_pallas, d_xla, rtol=1e-5, atol=1e-6)


def test_backward_sums_to_upstream():
    """Every output cell's gradient lands on exactly one fm cell (no ties):
    total mass is conserved per non-empty bin."""
    rng = np.random.default_rng(5)
    fm, boxes, mask = _case(rng, B=1, P=4)
    fmj, bj, mj = jnp.asarray(fm), jnp.asarray(boxes), jnp.asarray(mask)

    def loss(f):
        return jnp.sum(roi_pool_pallas(f, bj, mj, 0.25, 3, 3, True))

    d = np.asarray(jax.grad(loss)(fmj))
    pooled = roi_pool_reference(fm, boxes, spatial_scale=0.25)
    nonempty = (np.abs(pooled) > 0).sum()  # empty bins contribute 0
    assert d.sum() == pytest.approx(nonempty, rel=1e-5)


def test_pick_cb_calibrated_choices():
    """The VMEM model must reproduce the on-chip-calibrated block choices
    (v5e, bf16, P=232, round-2 windowed kernels with vmem_limit_bytes on
    both calls): flagship picks cb=64 for both directions — one program
    per image, measured fastest (f+b 10.7 -> 8.0 ms at the bench mix) —
    while the 2560px stretch config (lanes 768) demotes instead of
    overflowing the arena."""
    from cova_tpu.ops.roi_pool_pallas import (
        _bwd_vmem_bytes,
        _fwd_vmem_bytes,
        _pick_cb,
    )

    fwd = lambda b: _pick_cb(  # noqa: E731
        64, lambda cb: _fwd_vmem_bytes(320, 320, cb, 232, 9, 2, b, 64)
    )
    assert fwd(8) == 64
    assert fwd(32) == 64
    assert _pick_cb(
        64, lambda cb: _bwd_vmem_bytes(320, 320, cb, 232, 9, 2)
    ) == 64
    # Stretch config (2x resolution) must demote rather than overflow.
    assert _pick_cb(
        64, lambda cb: _fwd_vmem_bytes(640, 640, cb, 232, 9, 2, 2, 64)
    ) == 32
    assert _pick_cb(
        64, lambda cb: _bwd_vmem_bytes(640, 640, cb, 232, 9, 2)
    ) == 16


@pytest.mark.parametrize("seed", [0, 1])
def test_multi_window_boxes(seed):
    """W > 128 engages the windowed row phase (the TPU shape has 3 lane
    windows); boxes are placed to cross the 128- and 256-lane boundaries,
    hug the right edge, and span the full width."""
    rng = np.random.default_rng(seed)
    B, H, W, C, img = 1, 24, 320, 8, 1280
    fm = rng.normal(size=(B, H, W, C)).astype(np.float32)
    # fm-space column intents (scale 0.25 -> image coords x4):
    # in-window, crossing 128, crossing 256, full-width, right-edge.
    spans = [(10, 60), (100, 180), (220, 300), (0, 319), (280, 319),
             (126, 130), (0, 4), (310, 319)]
    boxes = []
    for (xa, xb) in spans:
        y1 = rng.uniform(0, 60)
        y2 = y1 + rng.uniform(4, 30)
        boxes.append([xa * 4.0, y1, xb * 4.0, y2])
    boxes = np.asarray([boxes], np.float32)
    mask = np.ones((B, len(spans)), bool)
    got = np.asarray(
        roi_pool_pallas(
            jnp.asarray(fm), jnp.asarray(boxes), jnp.asarray(mask),
            0.25, 3, 3, True,
        )
    )
    want = roi_pool_reference(fm, boxes, spatial_scale=0.25)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize(
    "bwd,edge", [("walk", "slab"), ("pyramid", "slab"), ("pyramid", "rows")]
)
def test_multi_window_backward(bwd, edge, monkeypatch):
    monkeypatch.setenv("COVA_ROI_BWD", bwd)
    monkeypatch.setenv("COVA_ROI_EDGE", edge)
    rng = np.random.default_rng(7)
    B, H, W, C = 1, 16, 320, 4
    n = B * H * W * C
    fm = ((rng.permutation(n) / n * 4 - 2).astype(np.float32)
          .reshape(B, H, W, C))  # unique values: tie-free gradients
    boxes = np.asarray(
        [[[100 * 4.0, 8.0, 300 * 4.0, 40.0],   # crosses both boundaries
          [0.0, 0.0, 319 * 4.0, 60.0],          # full map
          [500.0, 20.0, 530.0, 50.0]]], np.float32)
    mask = np.ones((B, 3), bool)
    g = rng.normal(size=(B, 3, 3, 3, C)).astype(np.float32)

    def loss_pallas(fm):
        out = roi_pool_pallas(fm, jnp.asarray(boxes), jnp.asarray(mask),
                              0.25, 3, 3, True)
        return jnp.sum(out * jnp.asarray(g))

    def loss_xla(fm):
        out = roi_pool(fm, jnp.asarray(boxes), spatial_scale=0.25,
                       out_h=3, out_w=3)
        return jnp.sum(out * jnp.asarray(g))

    gp = jax.grad(loss_pallas)(jnp.asarray(fm))
    gx = jax.grad(loss_xla)(jnp.asarray(fm))
    np.testing.assert_allclose(
        np.asarray(gp), np.asarray(gx), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ranged_forward_matches_oracle(seed, monkeypatch):
    """COVA_ROI_FWD=ranged: the chunk-max-pyramid forward must be exact
    against the oracle, including multi-window boxes, masked boxes, and
    clipped/empty bins."""
    monkeypatch.setenv("COVA_ROI_FWD", "ranged")
    rng = np.random.default_rng(seed)
    # H=W=32 with img=128 at scale 0.25 -> boxes span several 8-row chunks
    # and both lane windows; W=160+ would exceed interpret-mode patience.
    fm, boxes, mask = _case(rng, B=2, H=32, W=32, C=8, P=12, img=128)
    mask[:, 9:] = False
    got = np.asarray(
        roi_pool_pallas(
            jnp.asarray(fm), jnp.asarray(boxes), jnp.asarray(mask),
            0.25, 3, 3, True,
        )
    )
    want = roi_pool_reference(fm, boxes, spatial_scale=0.25)
    np.testing.assert_allclose(got[:, :9], want[:, :9], rtol=1e-6, atol=1e-6)
    assert (got[:, 9:] == 0).all()


def test_ranged_tall_boxes_and_chunk_aligned_bins(monkeypatch):
    """Bins whose bounds land exactly on chunk boundaries overlap the edge
    and interior decomposition — max idempotence must keep it exact. Also
    covers full-height boxes (pure interior runs)."""
    monkeypatch.setenv("COVA_ROI_FWD", "ranged")
    rng = np.random.default_rng(7)
    fm = rng.normal(size=(1, 48, 16, 8)).astype(np.float32)
    boxes = np.array([[
        [0.0, 0.0, 63.0, 191.0],     # full-height box
        [4.0, 0.0, 40.0, 95.0],      # bins 0/8/16/24 -> chunk-aligned
        [0.0, 32.0, 20.0, 46.0],     # short box, single chunk
        [8.0, 180.0, 30.0, 191.0],   # bottom-clipped
    ]], np.float32)
    mask = np.ones((1, 4), bool)
    got = np.asarray(
        roi_pool_pallas(
            jnp.asarray(fm), jnp.asarray(boxes), jnp.asarray(mask),
            0.25, 3, 3, True,
        )
    )
    want = roi_pool_reference(fm, boxes, spatial_scale=0.25)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("impl", ["walk", "ranged"])
def test_h_not_chunk_divisible_is_padded(impl, monkeypatch):
    """h % 8 != 0: the fold step must pad H to whole chunks — the kernels'
    chunk loads would otherwise CLAMP at the last partial chunk (dynamic-
    slice semantics), silently duplicating rows under a mislabeled row
    mask. Regression test for the padding fix; exercises fwd AND bwd."""
    monkeypatch.setenv("COVA_ROI_FWD", impl)
    rng = np.random.default_rng(9)
    fm, boxes, mask = _case(rng, H=12, W=16, img=48)
    fmj, bj, mj = jnp.asarray(fm), jnp.asarray(boxes), jnp.asarray(mask)
    got = np.asarray(roi_pool_pallas(fmj, bj, mj, 0.25, 3, 3, True))
    want = roi_pool_reference(fm, boxes, spatial_scale=0.25)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def loss_pallas(f):
        return (roi_pool_pallas(f, bj, mj, 0.25, 3, 3, True) ** 2).sum()

    def loss_xla(f):
        return (roi_pool(f, bj, spatial_scale=0.25) ** 2).sum()

    d_pallas = np.asarray(jax.grad(loss_pallas)(fmj))
    d_xla = np.asarray(jax.grad(loss_xla)(fmj))
    np.testing.assert_allclose(d_pallas, d_xla, rtol=1e-5, atol=1e-5)


def test_pyramid_backward_tall_and_aligned_bins(monkeypatch):
    """The pyramid backward's edge/interior split: full-height boxes (pure
    interior runs), chunk-aligned bins (no top edge), single-chunk bins
    (one edge visit covering both ends), and bottom-clipped bins must all
    match the XLA grad. Unique fm values keep gradients tie-free."""
    monkeypatch.setenv("COVA_ROI_BWD", "pyramid")
    rng = np.random.default_rng(11)
    B, H, W, C = 1, 48, 16, 4
    n = B * H * W * C
    fm = ((rng.permutation(n) / n * 4 - 2).astype(np.float32)
          .reshape(B, H, W, C))
    boxes = np.array([[
        [0.0, 0.0, 63.0, 191.0],     # full-height: interiors dominate
        [4.0, 0.0, 40.0, 95.0],      # bins chunk-aligned at 0/8/16/24
        [0.0, 32.0, 20.0, 46.0],     # short box, single chunk per bin
        [8.0, 180.0, 30.0, 191.0],   # bottom-clipped
        [12.0, 50.0, 50.0, 130.0],   # unaligned: edges + interiors
    ]], np.float32)
    mask = np.ones((1, 5), bool)
    g = rng.normal(size=(B, 5, 3, 3, C)).astype(np.float32)

    def loss_pallas(f):
        out = roi_pool_pallas(f, jnp.asarray(boxes), jnp.asarray(mask),
                              0.25, 3, 3, True)
        return jnp.sum(out * jnp.asarray(g))

    def loss_xla(f):
        out = roi_pool(f, jnp.asarray(boxes), spatial_scale=0.25,
                       out_h=3, out_w=3)
        return jnp.sum(out * jnp.asarray(g))

    gp = jax.grad(loss_pallas)(jnp.asarray(fm))
    gx = jax.grad(loss_xla)(jnp.asarray(fm))
    np.testing.assert_allclose(
        np.asarray(gp), np.asarray(gx), rtol=1e-5, atol=1e-6
    )


def test_pyramid_backward_overlapping_boxes_route_jointly(monkeypatch):
    """Multiple overlapping boxes routing gradients into the same
    (chunk, lane) slots of the shared buffer must sum correctly — the
    core invariant of the routed formulation (every contribution to a
    slot shares the compare key m1[c][lane])."""
    monkeypatch.setenv("COVA_ROI_BWD", "pyramid")
    rng = np.random.default_rng(13)
    B, H, W, C = 1, 32, 16, 4
    n = B * H * W * C
    fm = ((rng.permutation(n) / n).astype(np.float32).reshape(B, H, W, C))
    # Nested boxes: identical, contained, and staggered — bin maxes of
    # different boxes coincide at the same fm cells.
    boxes = np.array([[
        [0.0, 0.0, 63.0, 127.0],
        [0.0, 0.0, 63.0, 127.0],     # identical duplicate
        [8.0, 16.0, 56.0, 110.0],    # nested
        [0.0, 40.0, 63.0, 127.0],    # staggered overlap
    ]], np.float32)
    mask = np.ones((1, 4), bool)
    g = rng.normal(size=(B, 4, 3, 3, C)).astype(np.float32)

    def loss_pallas(f):
        out = roi_pool_pallas(f, jnp.asarray(boxes), jnp.asarray(mask),
                              0.25, 3, 3, True)
        return jnp.sum(out * jnp.asarray(g))

    def loss_xla(f):
        out = roi_pool(f, jnp.asarray(boxes), spatial_scale=0.25,
                       out_h=3, out_w=3)
        return jnp.sum(out * jnp.asarray(g))

    gp = jax.grad(loss_pallas)(jnp.asarray(fm))
    gx = jax.grad(loss_xla)(jnp.asarray(fm))
    np.testing.assert_allclose(
        np.asarray(gp), np.asarray(gx), rtol=1e-5, atol=1e-6
    )


def test_col_groups_disjoint_or_identical_all_widths():
    """_col_groups members' bins must be column-disjoint or bitwise
    identical for EVERY roi width — the invariant the routed backward's
    overwrite-key/sum-gradient combine relies on. Plain even/odd parity
    violates it at out_w=5 (roi_w=2: cells 0 and 2 give [0,1) vs [0,2)),
    which silently misrouted gradients before round 4's fix."""
    from cova_tpu.ops.roi_pool_pallas import _col_groups

    for out_w in range(1, 9):
        groups = _col_groups(out_w)
        assert sorted(j for g in groups for j in g) == list(range(out_w))
        # Check far beyond out_w: adjacent bins overlap at arbitrarily
        # large widths whenever (j+1)*rl % out_w != 0.
        for rl in range(1, 4 * out_w + 2):
            bins = [
                ((i * rl) // out_w, ((i + 1) * rl + out_w - 1) // out_w)
                for i in range(out_w)
            ]
            for g in groups:
                for a, b in zip(g, g[1:]):
                    same = bins[a] == bins[b]
                    disjoint = (
                        bins[a][1] <= bins[b][0] or bins[b][1] <= bins[a][0]
                    )
                    assert same or disjoint, (out_w, rl, a, b)
    # The default geometry keeps its historic (and fastest) parity split.
    assert _col_groups(3) == ((0, 2), (1,))


@pytest.mark.parametrize("bwd", ["walk", "pyramid"])
def test_backward_narrow_boxes_roi5(bwd, monkeypatch):
    """out 5x5 with boxes narrower than out_w feature cells: the regime
    where same-parity bins overlap non-identically (caught in round-4
    review — the pyramid backward misrouted gradients by 1.7 absolute
    before _col_groups validated its grouping)."""
    monkeypatch.setenv("COVA_ROI_BWD", bwd)
    rng = np.random.default_rng(17)
    B, H, W, C, P = 1, 16, 16, 4, 5
    fm = rng.normal(size=(B, H, W, C)).astype(np.float32)
    # 4-10 px wide/tall at scale 0.25 -> 1-2 feature cells < out_w=5.
    x1 = rng.uniform(0, 50, (B, P))
    y1 = rng.uniform(0, 50, (B, P))
    wpx = rng.uniform(4, 10, (B, P))
    hpx = rng.uniform(4, 10, (B, P))
    boxes = np.stack([x1, y1, x1 + wpx, y1 + hpx], -1).astype(np.float32)
    mask = np.ones((B, P), bool)
    g = rng.normal(size=(B, P, 5, 5, C)).astype(np.float32)

    def loss_pallas(f):
        out = roi_pool_pallas(f, jnp.asarray(boxes), jnp.asarray(mask),
                              0.25, 5, 5, True)
        return jnp.sum(out * jnp.asarray(g))

    def loss_xla(f):
        out = roi_pool(f, jnp.asarray(boxes), spatial_scale=0.25,
                       out_h=5, out_w=5)
        return jnp.sum(out * jnp.asarray(g))

    gp = jax.grad(loss_pallas)(jnp.asarray(fm))
    gx = jax.grad(loss_xla)(jnp.asarray(fm))
    np.testing.assert_allclose(
        np.asarray(gp), np.asarray(gx), rtol=1e-5, atol=1e-6
    )


def test_pick_cb_pyramid_scratch_term():
    """The pyramid backward's two f32 scratch buffers (~7.9 MB at
    flagship) must not demote the calibrated cb=64 pick, and must be
    accounted at the stretch geometry."""
    from cova_tpu.ops.roi_pool_pallas import _bwd_vmem_bytes, _pick_cb

    pick = lambda hw: _pick_cb(  # noqa: E731
        64, lambda cb: _bwd_vmem_bytes(hw, hw, cb, 232, 9, 2, pyramid=True)
    )
    assert pick(320) == 64
    assert pick(640) == 16
    for hw in (320, 640):
        walk = _bwd_vmem_bytes(hw, hw, 64, 232, 9, 2)
        pyr = _bwd_vmem_bytes(hw, hw, 64, 232, 9, 2, pyramid=True)
        assert pyr - walk == 2 * (hw // 8) * 64 * (((hw + 127) // 128) * 128) * 4


def test_pick_cb_ranged_scratch_term():
    """The ranged variant's f32 pyramid scratch (~3.9 MB at flagship) must
    not demote the flagship cb=64 pick, and must be accounted at the
    stretch geometry (where it is ~7.9 MB on top of an already-tight
    budget)."""
    from cova_tpu.ops.roi_pool_pallas import _fwd_vmem_bytes, _pick_cb

    pick = lambda hw, b: _pick_cb(  # noqa: E731
        64,
        lambda cb: _fwd_vmem_bytes(hw, hw, cb, 232, 9, 2, b, 64,
                                   ranged=True),
    )
    assert pick(320, 8) == 64
    assert pick(320, 32) == 64
    # ranged term grows the stretch footprint; must demote, not overflow
    assert pick(640, 2) in (16, 32)
    for hw, b in ((320, 8), (640, 2)):
        walk = _fwd_vmem_bytes(hw, hw, 64, 232, 9, 2, b, 64)
        ranged = _fwd_vmem_bytes(hw, hw, 64, 232, 9, 2, b, 64, ranged=True)
        assert ranged - walk == (hw // 8) * 64 * (((hw + 127) // 128) * 128) * 4
