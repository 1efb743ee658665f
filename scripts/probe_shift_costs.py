#!/usr/bin/env python
"""On-chip probe: cost of sublane-shift strategies inside a Pallas kernel.

The conv post-mortem (ops/conv3x3.py) says relayouts from dx=+-1 shifted
slices ate the MXU win. Findings so far:
  * a +-1 sublane-misaligned vector load does not even COMPILE at
    [2048,128] ("cannot statically prove that index in dimension 0 is a
    multiple of 8") — shifts must go through pltpu.roll or DMA;
  * this probe measures pltpu.roll against an aligned copy and against the
    conv's matmul shapes, inside one kernel fori_loop (REPS iterations,
    slice start varies 0/8 with the index so nothing hoists).
"""

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
        return acc + x_ref[pl.ds(8 * (i & 1), M), :]

    o_ref[:] = jax.lax.fori_loop(0, REPS, body, jnp.zeros_like(o_ref))


def k_roll(x_ref, o_ref):
    def body(i, acc):
        return acc + pltpu.roll(x_ref[pl.ds(8 * (i & 1), M), :], 1, 0)

    o_ref[:] = jax.lax.fori_loop(0, REPS, body, jnp.zeros_like(o_ref))


def k_roll2(x_ref, o_ref):
    """Two rolls per iter (the conv needs 6 rolls per 3 matmuls)."""

    def body(i, acc):
        a = x_ref[pl.ds(8 * (i & 1), M), :]
        return acc + pltpu.roll(a, 1, 0) + pltpu.roll(a, M - 1, 0)

    o_ref[:] = jax.lax.fori_loop(0, REPS, body, jnp.zeros_like(o_ref))


def make_matmul(n):
    def k(x_ref, w_ref, o_ref):
        def body(i, acc):
            return acc + jnp.dot(
                x_ref[pl.ds(8 * (i & 1), M), :], w_ref[:, :n],
                preferred_element_type=jnp.float32,
            )

        o_ref[:] = jax.lax.fori_loop(
            0, REPS, body, jnp.zeros((M, n), jnp.float32)
        ).astype(o_ref.dtype)

    return k


def bench(name, kernel, out_shape, dtype, *args):
    @jax.jit
    def run(*arrs):
        def body(i, acc):
            a0 = jax.lax.dynamic_update_slice(
                arrs[0], acc[:1, :1].astype(arrs[0].dtype), (0, 0)
            )
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(out_shape, dtype),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM)
                    for _ in range(len(arrs))
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a0, *arrs[1:])
            return acc + out[:1, :1].astype(jnp.float32)

        return jax.lax.fori_loop(
            0, STEPS, body, jnp.zeros((1, 1), jnp.float32)
        )

    t0 = time.time()
    _ = float(run(*args)[0, 0])
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        _ = float(run(*args)[0, 0])
        best = min(best, time.time() - t0)
    per_op_us = best / STEPS / REPS * 1e6
    print(f"{name:12s}: {per_op_us:8.2f} us/op  (compile {compile_s:.0f}s)",
          flush=True)


rng = np.random.default_rng(0)
dt = (
    jnp.bfloat16
    if (len(sys.argv) > 1 and sys.argv[1] == "bf16")
    else jnp.float32
)
x = jnp.asarray(rng.normal(size=(M + 8, 128)).astype(np.float32)).astype(dt)
w = jnp.asarray(rng.normal(size=(128, 192)).astype(np.float32)).astype(dt)

print(f"dtype={dt.__name__}, M={M}, REPS={REPS}", flush=True)
bench("copy", k_copy, (M, 128), dt, x)
bench("roll", k_roll, (M, 128), dt, x)
bench("roll2", k_roll2, (M, 128), dt, x)
bench("matmul192", make_matmul(192), (M, 192), dt, x, w)
bench("matmul128", make_matmul(128), (M, 128), dt, x, w)
