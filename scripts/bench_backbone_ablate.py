#!/usr/bin/env python
"""Round-3 ablation: where do the composed backbone's 39 ms go?

Variants of the REAL ResNetBackbone (resnet18_stem) fwd+bwd at B=8 1280^2:
  full train   : train=True (batch stats + running updates)  [the 39 ms]
  eval mode    : train=False (running stats, no stat computation)
  nostats      : train=True but BN coefficient path stubbed to constants
  unfused pool : train=True with COVA_BN_POOL_TU=0 (XLA pool path)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cova_tpu.models.resnet import make_backbone  # noqa: E402

B, H = 8, 1280
STEPS = 20
rng0 = jax.random.PRNGKey(0)

x48 = jnp.asarray(
    np.random.default_rng(0).integers(0, 255, (B, H // 4, H // 4, 48),
                                      np.uint8)
)


def bench(name, train):
    module = make_backbone("resnet18_stem", dtype=jnp.bfloat16)

    def fwd(p, bs, xu8):
        x = xu8.astype(jnp.bfloat16) / 255.0
        out = module.apply(
            {"params": p, "batch_stats": bs}, x, train,
            mutable=["batch_stats"] if train else [],
        )
        y = out[0] if isinstance(out, tuple) else out
        return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-9

    variables = module.init(rng0, x48.astype(jnp.bfloat16) / 255.0, True)
    params, bs = variables["params"], variables.get("batch_stats", {})
    g = jax.grad(fwd)

    @jax.jit
    def run(p, xu8):
        def body(i, p):
            gr = g(p, bs, xu8)
            return jax.tree_util.tree_map(lambda a, b: a + 1e-12 * b, p, gr)

        p = jax.lax.fori_loop(0, STEPS, body, p)
        return sum(
            jnp.sum(le.astype(jnp.float32))
            for le in jax.tree_util.tree_leaves(p)
        )

    t0 = time.time()
    _ = float(run(params, x48))
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        _ = float(run(params, x48))
        best = min(best, (time.time() - t0) / STEPS)
    print(f"{name:14s}: {best * 1000:7.2f} ms  (compile {compile_s:.0f}s)",
          flush=True)


print(f"B={B} H={H} bf16 fwd+bwd(params)", flush=True)
bench("full train", True)
bench("eval mode", False)
os.environ["COVA_BN_POOL_TU"] = "0"
bench("unfused pool", True)
del os.environ["COVA_BN_POOL_TU"]
