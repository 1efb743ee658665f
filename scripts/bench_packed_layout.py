#!/usr/bin/env python
"""On-chip A/B for the W-packed layer1 layout (VERDICT r2 item 3).

Hypothesis: layer1's C=64 occupies half of every 128-lane tile, so all
BN/elementwise traffic pays 2x HBM and convs cap at the O=64 MXU ceiling
(~72 TFLOP/s).  Packing W pairwise into channels ([B,320,320,64] ->
[B,320,160,128]) fills the lanes exactly: elementwise traffic halves, and
the conv becomes a dense [3,3,128,128] whose kernel is the logical
[3,3,64,64] scattered into parity blocks -- 2x the FLOPs at (hopefully)
~2x the MXU rate, i.e. neutral conv time with free elementwise wins.

Measures, at the layer1 hot shape (B=8):
  conv64      3x3x64x64   on [8,320,320,64]    (current)
  conv128     3x3x128x128 on [8,320,160,128]   (packed equivalent FLOPs x2)
  bnrelu64 / bnrelu128    batch-stats BN + ReLU at both layouts
each as fwd-only and value_and_grad loops.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

B, HW = 8, 320
STEPS = 30
rng = np.random.default_rng(0)

x64 = jnp.asarray(
    rng.normal(size=(B, HW, HW, 64)).astype(np.float32)
).astype(jnp.bfloat16)
x128 = jnp.asarray(
    rng.normal(size=(B, HW, HW // 2, 128)).astype(np.float32)
).astype(jnp.bfloat16)
w64 = jnp.asarray(
    (rng.normal(size=(3, 3, 64, 64)) * 0.05).astype(np.float32)
).astype(jnp.bfloat16)
w128 = jnp.asarray(
    (rng.normal(size=(3, 3, 128, 128)) * 0.05).astype(np.float32)
).astype(jnp.bfloat16)


def conv(x, w):
    # Same formulation as ops.conv3x3.conv3x3_reference (bf16 out; the MXU
    # accumulates f32 internally) — the 70.6 TFLOP/s round-2 anchor.
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def bnrelu(x, _w):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(0, 1, 2))
    var = xf.var(axis=(0, 1, 2))
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    return jnp.maximum(y, 0.0).astype(x.dtype)


def bench(name, fn, x, w, flops=None, grad=False):
    if grad:
        def step(x, w):
            return jnp.sum(fn(x, w).astype(jnp.float32))

        gfn = jax.grad(step, argnums=(0, 1))

        def once(xi, w):
            gx, gw = gfn(xi, w)
            return jnp.sum(gx[0, 0, 0, :2].astype(jnp.float32)) + jnp.sum(
                gw.astype(jnp.float32).ravel()[:2] if gw.ndim else gw
            )
    else:
        def once(xi, w):
            return jnp.sum(fn(xi, w)[0, 0, 0, :2].astype(jnp.float32))

    @jax.jit
    def loop(x, w):
        def body(i, acc):
            xi = x + (acc * 0).astype(x.dtype)
            return acc + once(xi, w)

        return jax.lax.fori_loop(0, STEPS, body, jnp.float32(0))

    t0 = time.time()
    _ = float(loop(x, w))
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        _ = float(loop(x, w))
        best = min(best, (time.time() - t0) / STEPS)
    rate = f"  ({flops / best / 1e12:5.1f} TFLOP/s)" if flops else ""
    print(f"{name:16s}: {best * 1000:7.2f} ms{rate}  (compile {compile_s:.0f}s)",
          flush=True)


f64 = 2 * B * HW * HW * 9 * 64 * 64
f128 = 2 * B * HW * (HW // 2) * 9 * 128 * 128
print(f"B={B} HW={HW} bf16 (conv128 does 2x the logical FLOPs)", flush=True)
bench("conv64 fwd", conv, x64, w64, f64)
bench("conv128 fwd", conv, x128, w128, f128)
bench("conv64 f+b", conv, x64, w64, 3 * f64, grad=True)
bench("conv128 f+b", conv, x128, w128, 3 * f128, grad=True)
bench("bnrelu64 fwd", bnrelu, x64, w64)
bench("bnrelu128 fwd", bnrelu, x128, w128)
bench("bnrelu64 f+b", bnrelu, x64, w64, grad=True)
bench("bnrelu128 f+b", bnrelu, x128, w128, grad=True)
