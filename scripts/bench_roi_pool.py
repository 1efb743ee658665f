#!/usr/bin/env python
"""On-chip microbenchmark: Pallas RoIPool fwd and fwd+bwd.

Methodology (see memory/env notes): N iterations inside one jit via
lax.fori_loop with the loop index folded into the input so XLA cannot hoist
the body; a scalar fetch forces the sync through the tunnel.

Usage: python scripts/bench_roi_pool.py [B] [C] [HW] [mix]

mix: "small" (default; 20-120 px boxes, the same SIZE range as prior
rounds' numbers — note the round-3 rewrite draws positions after sizes,
so the seed-0 stream differs and cross-round comparisons are
approximate, not exact), "real" (70% small + 20% medium + 10%
page-spanning tall containers, approximating a DOM's box-height
distribution), or "tall" (all 400-1200 px — the ranged forward's best
case).
Set COVA_ROI_FWD=ranged to A/B the chunk-max-pyramid forward variant.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from cova_tpu.ops.roi_pool_pallas import (  # noqa: E402
    _bwd_vmem_bytes,
    _fwd_vmem_bytes,
    _pad_h,
    _pick_cb,
    roi_pool_pallas,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
C = int(sys.argv[2]) if len(sys.argv) > 2 else 64
HW = int(sys.argv[3]) if len(sys.argv) > 3 else 320
MIX = sys.argv[4] if len(sys.argv) > 4 else "small"
P = 232
STEPS = 50

rng = np.random.default_rng(0)
fm = jnp.asarray(rng.normal(size=(B, HW, HW, C)).astype(np.float32)).astype(
    jnp.bfloat16
)
img = HW * 4
if MIX == "small":
    wid = rng.uniform(20, 120, (B, P))
    hei = rng.uniform(20, 120, (B, P))
elif MIX == "tall":
    wid = rng.uniform(100, 800, (B, P))
    hei = rng.uniform(400, 1200, (B, P))
elif MIX == "real":
    kind = rng.uniform(0, 1, (B, P))
    wid = np.where(
        kind < 0.7, rng.uniform(20, 120, (B, P)),
        np.where(kind < 0.9, rng.uniform(100, 400, (B, P)),
                 rng.uniform(300, 1000, (B, P))),
    )
    hei = np.where(
        kind < 0.7, rng.uniform(15, 80, (B, P)),
        np.where(kind < 0.9, rng.uniform(80, 400, (B, P)),
                 rng.uniform(400, 1200, (B, P))),
    )
else:
    raise SystemExit(f"unknown mix {MIX!r}")
x1 = rng.uniform(0, np.maximum(img - wid - 1, 1))
y1 = rng.uniform(0, np.maximum(img - hei - 1, 1))
boxes = jnp.asarray(
    np.stack([x1, y1, x1 + wid, y1 + hei], -1).astype(np.float32)
)
mask = jnp.asarray(np.ones((B, P), bool))
print(
    f"mix={MIX} roi_fwd={os.environ.get('COVA_ROI_FWD', 'ranged')} "
    f"roi_bwd={os.environ.get('COVA_ROI_BWD', 'pyramid')}"
)

# Mirror the impl's actual picks: padded H and the ranged scratch term
# (the header must describe the config the measured kernel compiles with;
# _roi_pool_fwd_impl defaults COVA_ROI_FWD to "ranged").
_ranged = os.environ.get("COVA_ROI_FWD", "ranged") == "ranged"
_hp = _pad_h(HW)
cb_f = _pick_cb(
    C, lambda cb: _fwd_vmem_bytes(_hp, HW, cb, P, 9, 2, B, C, ranged=_ranged)
)
_pyr = os.environ.get("COVA_ROI_BWD", "pyramid") == "pyramid"
cb_b = _pick_cb(
    C, lambda cb: _bwd_vmem_bytes(_hp, HW, cb, P, 9, 2, pyramid=_pyr)
)
print(
    f"B={B} C={C} HW={HW} P={P}: fwd cb={cb_f} "
    f"({_fwd_vmem_bytes(_hp, HW, cb_f, P, 9, 2, B, C, ranged=_ranged) / 1e6:.1f} MB), "
    f"bwd cb={cb_b} "
    f"({_bwd_vmem_bytes(_hp, HW, cb_b, P, 9, 2, pyramid=_pyr) / 1e6:.1f} MB)"
)


@jax.jit
def fwd_loop(fm, boxes, mask):
    def body(i, acc):
        # data dep on carry defeats hoisting; cast keeps fm's dtype (an f32
        # carry would silently promote the whole kernel to f32)
        f = fm + (acc * 0).astype(fm.dtype)
        out = roi_pool_pallas(f, boxes, mask, 0.25, 3, 3, False)
        return acc + jnp.sum(out[0, 0, 0, 0, :2].astype(jnp.float32))

    return jax.lax.fori_loop(0, STEPS, body, jnp.float32(0))


@jax.jit
def fwdbwd_loop(fm, boxes, mask):
    def step(f):
        return jnp.sum(
            roi_pool_pallas(f, boxes, mask, 0.25, 3, 3, False).astype(
                jnp.float32
            )
        )

    def body(i, acc):
        f = fm + (acc * 0).astype(fm.dtype)
        loss, dfm = jax.value_and_grad(step)(f)
        return acc + loss * 0 + jnp.sum(
            dfm[0, 0, 0, :2].astype(jnp.float32)
        )

    return jax.lax.fori_loop(0, STEPS, body, jnp.float32(0))


for name, fn in [("fwd", fwd_loop), ("fwd+bwd", fwdbwd_loop)]:
    t0 = time.time()
    _ = float(fn(fm, boxes, mask))
    print(f"{name}: compile+first {time.time() - t0:.1f}s")
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        _ = float(fn(fm, boxes, mask))
        best = min(best, (time.time() - t0) / STEPS)
    print(f"{name}: {best * 1000:.2f} ms/iter")
