#!/usr/bin/env python
"""On-chip probe: cost of sublane-shift strategies inside a Pallas kernel.

The conv post-mortem (ops/conv3x3.py) says relayouts from dx=+-1 shifted
slices ate the MXU win. The untried output-stationary design needs ONE of:
  (a) pltpu.roll along sublanes of the matmul output panels, or
  (b) misaligned +-1 sublane slices (known slow — calibration), or
  (c) aligned copies (floor).
This measures each against a pure [M,128]x[128,192] matmul and a plain
VMEM copy, all at the conv's working shapes. REPS iterations inside the
kernel amortize pallas_call overhead.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 2048
REPS = 64
STEPS = 20


def k_copy(x_ref, o_ref):
    def body(i, acc):
        return acc + x_ref[pl.ds(0, M), :] * (1.0 + i * 0)

    o_ref[:] = jax.lax.fori_loop(0, REPS, body, jnp.zeros_like(o_ref))


def k_misaligned(x_ref, o_ref):
    def body(i, acc):
        return acc + x_ref[pl.ds(1 + (i & 1), M), :]

    o_ref[:] = jax.lax.fori_loop(0, REPS, body, jnp.zeros_like(o_ref))


def k_roll(x_ref, o_ref):
    def body(i, acc):
        return acc + pltpu.roll(x_ref[pl.ds(0, M), :], 1, 0)

    o_ref[:] = jax.lax.fori_loop(0, REPS, body, jnp.zeros_like(o_ref))


def k_matmul(x_ref, w_ref, o_ref):
    def body(i, acc):
        return acc + jnp.dot(
            x_ref[pl.ds(0, M), :], w_ref[:],
            preferred_element_type=jnp.float32,
        )

    o_ref[:] = jax.lax.fori_loop(
        0, REPS, body, jnp.zeros((M, w_ref.shape[1]), jnp.float32)
    ).astype(o_ref.dtype)


def bench(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.time()
    _ = float(jnp.sum(f(*args)[:1, :1].astype(jnp.float32)))
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        _ = float(jnp.sum(f(*args)[:1, :1].astype(jnp.float32)))
        best = min(best, time.time() - t0)
    per_op_us = best / STEPS / REPS * 1e6
    print(f"{name:12s}: {per_op_us:8.2f} us/op  (compile {compile_s:.0f}s)")


def outer(kernel, n_in, out_shape, dtype):
    def run(*arrs):
        def body(i, acc):
            a0 = arrs[0] + (acc[:1, :1] * 0).astype(arrs[0].dtype)
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(out_shape, dtype),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM)
                    for _ in range(n_in)
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a0, *arrs[1:])
            return acc + out[:1, :1].astype(jnp.float32) * 0 + out[
                :1, :1
            ].astype(jnp.float32)
        # keep only a scalar-ish carry; fetch forces sync
        return jax.lax.fori_loop(
            0, STEPS, body, jnp.zeros((1, 1), jnp.float32)
        )

    return run


rng = np.random.default_rng(0)
dt = jnp.bfloat16 if (len(sys.argv) > 1 and sys.argv[1] == "bf16") else jnp.float32
x = jnp.asarray(rng.normal(size=(M + 8, 128)).astype(np.float32)).astype(dt)
w = jnp.asarray(rng.normal(size=(128, 192)).astype(np.float32)).astype(dt)

print(f"dtype={dt.__name__}, M={M}, REPS={REPS}")
bench("copy", outer(k_copy, 1, (M, 128), dt), x)
bench("misaligned", outer(k_misaligned, 1, (M, 128), dt), x)
bench("roll", outer(k_roll, 1, (M, 128), dt), x)
bench("matmul192", outer(k_matmul, 2, (M, 192), dt), x, w)
