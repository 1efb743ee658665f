#!/usr/bin/env python
"""Measure dropout-mask RNG cost: threefry vs rbg bit generation on chip.

The flagship decoder applies two Dropout masks over [B, P, 992] per step
(models/cova.py:190,194 — reference semantics models.py:83-90). Mask
generation is pure RNG: threefry2x32 is serial-ish VPU work, while the
'rbg' impl uses the hardware RNG for bits but keeps threefry for
split/fold_in (stream-derivation quality unchanged).

Numbers are dispatch-inclusive throughput: 50 jit calls are dispatched
asynchronously and timed with one trailing block_until_ready, so the
ms/step includes amortized Python dispatch, not isolated kernel latency.

Usage: python scripts/bench_rng.py [B] [P] [F]
"""

import sys
import time

import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
P = int(sys.argv[2]) if len(sys.argv) > 2 else 232
F = int(sys.argv[3]) if len(sys.argv) > 3 else 992
STEPS = 50
RATE = 0.2


def bench(name, key):
    @jax.jit
    def body(k):
        # Two masks per step, like the decoder; fold_in mimics flax's
        # per-call key derivation.
        k1 = jax.random.fold_in(k, 1)
        k2 = jax.random.fold_in(k, 2)
        m1 = jax.random.bernoulli(k1, 1 - RATE, (B, P, F))
        m2 = jax.random.bernoulli(k2, 1 - RATE, (B, P, F))
        return jnp.float32(m1.sum() + m2.sum())

    out = body(key)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = body(key)
    out.block_until_ready()
    ms = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{name:10s} 2x bernoulli[{B},{P},{F}]: {ms:.3f} ms/step")
    return ms


print(f"backend={jax.default_backend()}")
t = bench("threefry", jax.random.PRNGKey(0))
r = bench("rbg", jax.random.key(0, impl="rbg"))
print(f"speedup {t / r:.2f}x, delta {t - r:.3f} ms")
