#!/usr/bin/env python
"""Decompose the stem cost (round-3: profile says the stem, not the blocks,
owns the backbone's time).

Pieces, at the real model geometry (B=8, 1280^2, bf16, host-s2d(4) input):
  cast      : uint8 [8,320,320,48] -> bf16/255 only
  conv s2d  : stem_conv_s2d (XLA [3,3,48,256] w/ scattered k) fwd
  conv s2d b: same, fwd + grad wrt k7
  conv fixed: same conv but k4 precomputed outside (no gather in graph)
  bnpool    : fused bn_relu_pool_s2d fwd / fwd+bwd on [8,320,320,256]
  stem full : cast + conv + bn(coeffs) + pool fwd+bwd (the model path)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cova_tpu.ops.bn_pool import bn_relu_pool_s2d  # noqa: E402
from cova_tpu.ops.conv_stem import _tap_index, stem_conv_s2d  # noqa: E402

B, H = 8, 1280
STEPS = 20
rng = np.random.default_rng(0)

x48_u8 = jnp.asarray(
    rng.integers(0, 255, (B, H // 4, H // 4, 48), np.uint8)
)
k7 = jnp.asarray((rng.normal(size=(7, 7, 3, 64)) * 0.05).astype(np.float32))
ys0 = jnp.asarray(
    rng.normal(size=(B, H // 4, H // 4, 256)).astype(np.float32)
).astype(jnp.bfloat16)
scale = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
shift = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))


def bench(name, make_loop, *args):
    loop = jax.jit(make_loop)
    t0 = time.time()
    _ = float(loop(*args))
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        _ = float(loop(*args))
        best = min(best, (time.time() - t0) / STEPS)
    print(f"{name:12s}: {best * 1000:7.2f} ms  (compile {compile_s:.0f}s)",
          flush=True)


def cast_loop(xu8):
    def body(i, acc):
        x = (xu8 + (acc * 0).astype(jnp.uint8)).astype(jnp.bfloat16) / 255.0
        return acc + jnp.sum(x[0, 0, 0, :2].astype(jnp.float32))

    return jax.lax.fori_loop(0, STEPS, body, jnp.float32(0))


def conv_loop(xu8, k7):
    def body(i, acc):
        x = (xu8 + (acc * 0).astype(jnp.uint8)).astype(jnp.bfloat16) / 255.0
        ys = stem_conv_s2d(x, k7)
        return acc + jnp.sum(ys[0, 0, 0, :2].astype(jnp.float32))

    return jax.lax.fori_loop(0, STEPS, body, jnp.float32(0))


def convb_loop(xu8, k7):
    def step(k7, x):
        return jnp.sum(stem_conv_s2d(x, k7).astype(jnp.float32) ** 2) * 1e-9

    def body(i, carry):
        acc, k = carry
        x = (xu8 + (acc * 0).astype(jnp.uint8)).astype(jnp.bfloat16) / 255.0
        gk = jax.grad(step)(k, x)
        return (acc + jnp.sum(gk[0, 0, 0, :2]), k + 1e-12 * gk)

    acc, k = jax.lax.fori_loop(
        0, STEPS, body, (jnp.float32(0), k7)
    )
    return acc + jnp.sum(k[0, 0, 0, :2])


def convfixed_loop(xu8, k4):
    from cova_tpu.ops.conv3x3 import conv3x3_reference

    def body(i, acc):
        x = (xu8 + (acc * 0).astype(jnp.uint8)).astype(jnp.bfloat16) / 255.0
        ys = conv3x3_reference(x, k4)
        return acc + jnp.sum(ys[0, 0, 0, :2].astype(jnp.float32))

    return jax.lax.fori_loop(0, STEPS, body, jnp.float32(0))


def bnpool_loop(ys, scale, shift):
    def body(i, acc):
        y = ys + (acc * 0).astype(ys.dtype)
        out = bn_relu_pool_s2d(y, scale, shift)
        return acc + jnp.sum(out[0, 0, 0, :2].astype(jnp.float32))

    return jax.lax.fori_loop(0, STEPS, body, jnp.float32(0))


def bnpoolb_loop(ys, scale, shift):
    def step(y, scale, shift):
        return (
            jnp.sum(bn_relu_pool_s2d(y, scale, shift).astype(jnp.float32) ** 2)
            * 1e-9
        )

    def body(i, acc):
        y = ys + (acc * 0).astype(ys.dtype)
        gy = jax.grad(step)(y, scale, shift)
        return acc + jnp.sum(gy[0, 0, 0, :2].astype(jnp.float32))

    return jax.lax.fori_loop(0, STEPS, body, jnp.float32(0))


# Precompute the scattered kernel once (isolates the in-graph gather cost).
idx = np.asarray(_tap_index(7, 7, 3, 3))
k_flat = np.concatenate(
    [np.asarray(k7).reshape(7 * 7 * 3, 64), np.zeros((1, 64), np.float32)]
)
k4_np = k_flat[idx].reshape(3, 3, 48, 256)
k4 = jnp.asarray(k4_np).astype(jnp.bfloat16)

print(f"B={B} H={H} bf16", flush=True)
bench("cast", cast_loop, x48_u8)
bench("conv s2d", conv_loop, x48_u8, k7)
bench("conv fixed", convfixed_loop, x48_u8, k4)
bench("conv s2d b", convb_loop, x48_u8, k7)
bench("bnpool", bnpool_loop, ys0, scale, shift)
bench("bnpool b", bnpoolb_loop, ys0, scale, shift)
