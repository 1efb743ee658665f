"""Graceful degradation on compile-time VMEM exhaustion.

The Pallas kernels' block sizes come from calibrated VMEM models
(``roi_pool_pallas._SCOPED_VMEM_BUDGET``, ``bn_pool._TU_BUDGET``) anchored
on v5e at the flagship/stretch geometries. At an unanchored geometry or
after a compiler change the model can be optimistic and Mosaic/XLA raises a
RESOURCE_EXHAUSTED ("VMEM", "scoped memory") at compile time — which
surfaces when the enclosing jit step first runs, far from the kernel's own
call site. ``with_vmem_fallback`` is the recovery loop the trainer and
benchmarks wrap around that first dispatch: shrink every calibrated budget,
drop the jit caches so the kernels re-trace with smaller blocks, and retry.
The limits (smallest cb, tu=0) are the always-correct fallbacks — cb=1
windows and the unfused XLA bn path — so the loop terminates in a working
configuration instead of a crash (VERDICT r2 item 7).
"""

from __future__ import annotations

from typing import Callable, TypeVar

T = TypeVar("T")

_OOM_MARKERS = (
    "vmem",
    "scoped memory",
    "exceeds the memory limit",
)


def is_vmem_oom(err: BaseException) -> bool:
    """True only for COMPILE-time VMEM/scoped-memory exhaustion.

    Deliberately narrower than "RESOURCE_EXHAUSTED": a *runtime* HBM OOM
    also carries that status, but shrinking Pallas block budgets can't fix
    it — and retrying a step whose donated input buffers were already
    consumed would surface a confusing "Array has been deleted" instead of
    the real diagnosis. HBM messages name their memory space ("... bytes
    in hbm"), so any mention of hbm disqualifies.
    """
    s = f"{type(err).__name__}: {err}".lower()
    return any(m in s for m in _OOM_MARKERS) and "hbm" not in s


def with_vmem_fallback(
    fn: Callable[[], T], max_retries: int = 4, _shrink=None
) -> T:
    """Run ``fn`` (typically: the first dispatch of a jitted step); on a
    VMEM compile OOM, shrink the kernel budgets, clear the jit caches, and
    retry — up to ``max_retries`` times, then re-raise.

    ``_shrink``: test hook; the default attributes the OOM to a kernel by
    the ``name=`` each pallas_call carries ("roi_pool_*" / "bn_pool_*" in
    the Mosaic error text) and shrinks only the implicated budget — an
    unattributable message shrinks both (the always-correct fallback),
    so a bn_pool OOM no longer demotes the RoI kernel's channel block for
    the rest of the process (and vice versa).
    """
    import jax

    from . import bn_pool, roi_pool_pallas

    def default_shrink(err_text: str = ""):
        hit_roi = "roi_pool" in err_text
        hit_bn = "bn_pool" in err_text
        if not (hit_roi or hit_bn):
            hit_roi = hit_bn = True
        cb_budget = (
            roi_pool_pallas.shrink_vmem_budget()
            if hit_roi else roi_pool_pallas.vmem_budget()
        )
        tu_budget = (
            bn_pool.shrink_tu_budget()
            if hit_bn else bn_pool.tu_budget()
        )
        return cb_budget, tu_budget

    shrink = _shrink or default_shrink
    for attempt in range(max_retries + 1):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — filtered by is_vmem_oom
            if not is_vmem_oom(e) or attempt == max_retries:
                raise
            try:
                budgets = shrink(f"{e}".lower())
            except TypeError:  # zero-arg test hooks
                budgets = shrink()
            print(
                f"VMEM compile OOM ({type(e).__name__}); shrinking kernel "
                f"budgets to {budgets} and recompiling "
                f"(attempt {attempt + 1}/{max_retries})"
            )
            jax.clear_caches()
    raise AssertionError("unreachable")
