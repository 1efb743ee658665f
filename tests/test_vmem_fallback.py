"""Graceful VMEM-OOM degradation (VERDICT r2 item 7).

The calibrated kernel budgets can be optimistic at unanchored geometries;
instead of crashing, the first jit dispatch is wrapped in
``with_vmem_fallback``: shrink budgets, clear jit caches, re-trace. These
tests pin (a) the retry loop's contract, (b) that a shrunken budget
actually produces smaller blocks, and (c) that the smallest-block kernels
still produce oracle-correct output — the end state of the fallback.
"""

import numpy as np
import pytest

from cova_tpu.ops import bn_pool, roi_pool_pallas
from cova_tpu.ops.vmem_fallback import is_vmem_oom, with_vmem_fallback


class FakeOOM(Exception):
    pass


def test_retries_on_vmem_oom_then_succeeds():
    calls = {"fn": 0, "shrink": 0}

    def fn():
        calls["fn"] += 1
        if calls["fn"] < 3:
            raise FakeOOM("RESOURCE_EXHAUSTED: Attempting to allocate VMEM")
        return "ok"

    def shrink():
        calls["shrink"] += 1
        return (1, 1)

    assert with_vmem_fallback(fn, _shrink=shrink) == "ok"
    assert calls == {"fn": 3, "shrink": 2}


def test_non_oom_errors_pass_through():
    def fn():
        raise ValueError("unrelated failure")

    with pytest.raises(ValueError, match="unrelated"):
        with_vmem_fallback(fn, _shrink=lambda: (1, 1))


def test_gives_up_after_max_retries():
    def fn():
        raise FakeOOM("Mosaic: scoped memory exceeds the memory limit")

    with pytest.raises(FakeOOM):
        with_vmem_fallback(fn, max_retries=2, _shrink=lambda: (1, 1))


def test_is_vmem_oom_markers():
    assert is_vmem_oom(
        RuntimeError("RESOURCE_EXHAUSTED: Attempting to allocate VMEM")
    )
    assert is_vmem_oom(RuntimeError("VMEM limit"))
    assert is_vmem_oom(
        RuntimeError("Mosaic: scoped memory exceeds the memory limit")
    )
    # Runtime HBM OOMs carry RESOURCE_EXHAUSTED too, but shrinking Pallas
    # budgets can't fix them (and the step's donated inputs are gone) —
    # they must pass through as the real error.
    assert not is_vmem_oom(
        RuntimeError(
            "RESOURCE_EXHAUSTED: Out of memory allocating 123456 bytes "
            "in hbm"
        )
    )
    assert not is_vmem_oom(RuntimeError("shape mismatch"))


def test_shrunk_budget_picks_smaller_blocks(monkeypatch):
    """Shrinking must actually change the kernels' block choices."""
    h, w, p, ohw, item, b, c = 320, 320, 232, 9, 2, 8, 64
    bytes_at = lambda cb: roi_pool_pallas._fwd_vmem_bytes(  # noqa: E731
        h, w, cb, p, ohw, item, b, c
    )
    monkeypatch.setattr(roi_pool_pallas, "_SCOPED_VMEM_BUDGET", int(85e6))
    big = roi_pool_pallas._pick_cb(c, bytes_at)
    monkeypatch.setattr(
        roi_pool_pallas, "_SCOPED_VMEM_BUDGET",
        roi_pool_pallas._SCOPED_VMEM_BUDGET // 8,
    )
    small = roi_pool_pallas._pick_cb(c, bytes_at)
    assert small < big

    monkeypatch.setattr(bn_pool, "_TU_BUDGET", 11000)
    assert bn_pool._pick_tu(320) == 32
    monkeypatch.setattr(bn_pool, "_TU_BUDGET", 1)
    assert bn_pool._pick_tu(320) == 0  # 0 = unfused-XLA fallback path


def test_smallest_blocks_still_correct(monkeypatch):
    """Force an over-budget geometry (budget so small only cb=1 fits) and
    check the kernel output against the numpy oracle — the configuration
    the fallback loop lands in must be CORRECT, just slower."""
    import jax.numpy as jnp

    from cova_tpu.ops.roi_pool import roi_pool_reference

    monkeypatch.setattr(roi_pool_pallas, "_SCOPED_VMEM_BUDGET", 1)
    rng = np.random.default_rng(3)
    B, H, W, C, P, img = 2, 16, 16, 8, 10, 64
    fm = rng.normal(size=(B, H, W, C)).astype(np.float32)
    x1 = rng.uniform(0, img - 4, (B, P))
    y1 = rng.uniform(0, img - 4, (B, P))
    boxes = np.stack(
        [x1, y1, x1 + rng.uniform(0.5, img - x1),
         y1 + rng.uniform(0.5, img - y1)], -1
    ).astype(np.float32)
    mask = np.ones((B, P), bool)
    got = np.asarray(
        roi_pool_pallas.roi_pool_pallas(
            jnp.asarray(fm), jnp.asarray(boxes), jnp.asarray(mask),
            0.25, 3, 3, True,
        )
    )
    want = roi_pool_reference(fm, boxes, spatial_scale=0.25)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
