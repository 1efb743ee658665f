#!/usr/bin/env python
"""Ablate the backbone's 48 ms: stem vs blocks, BN vs none, fwd vs fwd+bwd.

Usage: python scripts/profile_backbone.py [B] [H]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import linen as nn  # noqa: E402

from cova_tpu.models.resnet import (  # noqa: E402
    BasicBlock,
    BatchNorm,
    StemConv,
    make_backbone,
)
from cova_tpu.ops.conv_stem import stem_pool_s2d  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
H = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
STEPS = 20
rng0 = jax.random.PRNGKey(0)

x_img = jnp.asarray(
    np.random.default_rng(0).integers(0, 255, (B, H, H, 3), np.uint8)
)
fm = jnp.asarray(
    np.random.default_rng(1).normal(size=(B, H // 4, H // 4, 64))
).astype(jnp.bfloat16)


def bench(name, module, x, bwd=True):
    variables = module.init(rng0, x, True)
    params = variables["params"]
    bs = variables.get("batch_stats", {})

    def loss(p, x):
        out = module.apply(
            {"params": p, "batch_stats": bs}, x, True,
            mutable=["batch_stats"] if bs else [],
        )
        y = out[0] if isinstance(out, tuple) else out
        return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-9

    g = jax.grad(loss) if bwd else None

    @jax.jit
    def run(p):
        def body(i, p):
            if bwd:
                gr = g(p, x)
                return jax.tree_util.tree_map(
                    lambda a, b: a + 1e-12 * b, p, gr
                )
            return jax.tree_util.tree_map(
                lambda a: a + 1e-12 * loss(p, x), p
            )

        p = jax.lax.fori_loop(0, STEPS, body, p)
        return sum(
            jnp.sum(l.astype(jnp.float32))
            for l in jax.tree_util.tree_leaves(p)
        )

    t0 = time.time()
    _ = float(run(params))
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        _ = float(run(params))
        best = min(best, (time.time() - t0) / STEPS)
    print(f"{name:22s}: {best * 1000:7.2f} ms  (compile {compile_s:.0f}s)",
          flush=True)


class StemOnly(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool):
        x = x.astype(jnp.bfloat16) / 255.0
        ys = StemConv(64, dtype=jnp.bfloat16, s2d_output=True)(x)
        b, u, v, c4 = ys.shape
        grouped = ys.reshape(b, u, v * 4, 64)
        grouped = BatchNorm(jnp.bfloat16)(grouped, train)
        grouped = nn.relu(grouped)
        return stem_pool_s2d(grouped.reshape(b, u, v, c4))


class BlocksOnly(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool):
        x = BasicBlock(64, dtype=jnp.bfloat16)(x, train)
        return BasicBlock(64, dtype=jnp.bfloat16)(x, train)


class ConvsOnly(nn.Module):
    """4 convs + relu, no BN, no residual."""

    @nn.compact
    def __call__(self, x, train: bool):
        for _ in range(4):
            x = nn.relu(
                nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=jnp.bfloat16)(x)
            )
        return x


class ConvsBN(nn.Module):
    """4 convs + BN + relu, no residual."""

    @nn.compact
    def __call__(self, x, train: bool):
        for _ in range(4):
            x = nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=jnp.bfloat16)(x)
            x = BatchNorm(jnp.bfloat16)(x, train)
            x = nn.relu(x)
        return x


class FullBackbone(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool):
        x = x.astype(jnp.bfloat16) / 255.0
        return make_backbone("resnet18_stem", dtype=jnp.bfloat16)(x, train)


bench("stem fwd+bwd", StemOnly(), x_img)
bench("blocks fwd+bwd", BlocksOnly(), fm)
bench("blocks fwd", BlocksOnly(), fm, bwd=False)
bench("4convs-relu fwd+bwd", ConvsOnly(), fm)
bench("4convs-bn fwd+bwd", ConvsBN(), fm)
bench("backbone fwd", FullBackbone(), x_img, bwd=False)
