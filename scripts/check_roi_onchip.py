#!/usr/bin/env python
"""On-chip numerics check: compiled RoIPool kernels vs the XLA reference.

The pytest oracle suite runs the kernels in interpret mode on CPU — exact
semantics, but it never exercises the MOSAIC lowering the chip actually
runs. This script compiles the real kernels (current COVA_ROI_FWD /
COVA_ROI_BWD defaults) on whatever backend is active and checks forward
outputs and input gradients against the XLA sparse-table implementation on
a tie-free map with a mixed small/tall/multi-window box set.

Exit 0 on agreement; prints max deltas. Battery step: roi_onchip.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cova_tpu.ops.roi_pool import roi_pool  # noqa: E402
from cova_tpu.ops.roi_pool_pallas import roi_pool_pallas  # noqa: E402


def main() -> int:
    rng = np.random.default_rng(17)
    B, H, W, C = 2, 80, 320, 64
    img = 4 * H
    n = B * H * W * C
    # Unique values -> tie-free gradients (XLA splits ties, kernel sums).
    fm = ((rng.permutation(n) / n * 4 - 2).astype(np.float32)
          .reshape(B, H, W, C))
    P = 24
    boxes = np.zeros((B, P, 4), np.float32)
    for b in range(B):
        for p in range(P):
            kind = p % 3
            if kind == 0:  # small
                w, h = rng.uniform(20, 120, 2)
            elif kind == 1:  # medium
                w, h = rng.uniform(100, 400, 2)
            else:  # tall / page-spanning (multi-window, many chunks)
                w = rng.uniform(300, 1000)
                h = rng.uniform(300, img - 10)
            x1 = rng.uniform(0, max(img - w - 1, 1))
            y1 = rng.uniform(0, max(img - h - 1, 1))
            boxes[b, p] = [x1, y1, x1 + w, y1 + h]
    mask = np.ones((B, P), bool)
    mask[:, -2:] = False  # padded slots must stay zero / gradient-free
    g = rng.normal(size=(B, P, 3, 3, C)).astype(np.float32)

    fmj = jnp.asarray(fm)
    bj, mj, gj = jnp.asarray(boxes), jnp.asarray(mask), jnp.asarray(g)

    @jax.jit
    def pallas_out_and_grad(f):
        def loss(f):
            return jnp.sum(
                roi_pool_pallas(f, bj, mj, 0.25, 3, 3, False) * gj
            )
        out = roi_pool_pallas(f, bj, mj, 0.25, 3, 3, False)
        return out, jax.grad(loss)(f)

    @jax.jit
    def xla_out_and_grad(f):
        def loss(f):
            return jnp.sum(
                jnp.where(mj[..., None, None, None],
                          roi_pool(f, bj, spatial_scale=0.25), 0.0) * gj
            )
        out = roi_pool(f, bj, spatial_scale=0.25)
        return jnp.where(mj[..., None, None, None], out, 0.0), \
            jax.grad(loss)(f)

    got_out, got_grad = map(np.asarray, pallas_out_and_grad(fmj))
    want_out, want_grad = map(np.asarray, xla_out_and_grad(fmj))

    d_out = np.abs(got_out - want_out).max()
    d_grad = np.abs(got_grad - want_grad).max()
    print(
        f"backend={jax.default_backend()} "
        f"fwd={os.environ.get('COVA_ROI_FWD', 'ranged')} "
        f"bwd={os.environ.get('COVA_ROI_BWD', 'pyramid')} "
        f"max|out delta|={d_out:.3e} max|grad delta|={d_grad:.3e}"
    )
    ok = d_out < 1e-5 and d_grad < 1e-5
    print("roi_onchip:", "OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
