#!/usr/bin/env python
"""On-chip 3x3-conv shoot-out at the model's hot shape: XLA lax.conv vs the
round-1 dx-copy Pallas kernel vs the round-2 output-roll variant.

Usage: python scripts/bench_conv.py [B] [HW] [C]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from cova_tpu.ops.conv3x3 import (  # noqa: E402
    conv3x3,
    conv3x3_reference,
    conv3x3_roll,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
HW = int(sys.argv[2]) if len(sys.argv) > 2 else 320
C = int(sys.argv[3]) if len(sys.argv) > 3 else 64
STEPS = 30

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, HW, HW, C)).astype(np.float32)).astype(
    jnp.bfloat16
)
w = jnp.asarray(
    (rng.normal(size=(3, 3, C, C)) * 0.05).astype(np.float32)
).astype(jnp.bfloat16)

flops = 2 * B * HW * HW * 9 * C * C


def bench(name, fn):
    @jax.jit
    def loop(x, w):
        def body(i, acc):
            xi = x + (acc * 0).astype(x.dtype)
            out = fn(xi, w)
            return acc + jnp.sum(out[0, 0, 0, :2].astype(jnp.float32))

        return jax.lax.fori_loop(0, STEPS, body, jnp.float32(0))

    try:
        t0 = time.time()
        _ = float(loop(x, w))
        compile_s = time.time() - t0
    except Exception as e:
        print(f"{name:10s}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        _ = float(loop(x, w))
        best = min(best, (time.time() - t0) / STEPS)
    print(
        f"{name:10s}: {best * 1000:7.2f} ms  "
        f"({flops / best / 1e12:5.1f} TFLOP/s)  (compile {compile_s:.0f}s)",
        flush=True,
    )


print(f"B={B} HW={HW} C={C} bf16", flush=True)
bench("xla", conv3x3_reference)
bench("roll", lambda x, w: conv3x3_roll(x, w, 2048, False))
bench("dxcopy_r1", lambda x, w: conv3x3(x, w, 2048, False))
