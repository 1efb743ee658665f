#!/usr/bin/env python
"""Decompose the flagship train step into segment costs on chip.

Times, each in a jitted fori-loop with a scalar fetch (tunnel-safe):
  full    : full train_step (fwd+bwd+Adam)
  backbone: stem+layer1 fwd+bwd on [B, H, W, 3]
  roipool : Pallas RoIPool fwd+bwd on the stride-4 feature map
  head    : bbox encoder + GAT + decoder fwd+bwd (boxes-only path)

Usage: python scripts/profile_step.py [B] [H]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cova_tpu.config import Config  # noqa: E402
from cova_tpu.data.batching import collate  # noqa: E402
from cova_tpu.data.records import pad_page  # noqa: E402
from cova_tpu.data.synthetic import synth_image, synth_record  # noqa: E402
from cova_tpu.models.cova import build_model  # noqa: E402
from cova_tpu.train.steps import create_train_state, train_step  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
H = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
STEPS = 20

cfg = Config(batch_size=B, img_height=H, compute_dtype="bfloat16")
model = build_model(cfg)

imgs, pages = [], []
for i in range(B):
    rng = np.random.default_rng((7, i))
    rec = synth_record(str(i), H, rng, min_boxes=60,
                       max_boxes=min(120, cfg.max_boxes))
    imgs.append(synth_image(rec, H, rng))
    pages.append(pad_page(rec, cfg.pad_boxes, cfg.context_size))
batch = jax.device_put(collate(imgs, pages))
state = create_train_state(model, cfg, batch, jax.random.PRNGKey(0))
rngk = jax.random.PRNGKey(1)


def bench(name, loop_body, init):
    @jax.jit
    def run(carry):
        c = jax.lax.fori_loop(0, STEPS, loop_body, carry)
        leaves = jax.tree_util.tree_leaves(c)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves
                   if jnp.issubdtype(l.dtype, jnp.floating))

    t0 = time.time()
    _ = float(run(init))
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        _ = float(run(init))
        best = min(best, (time.time() - t0) / STEPS)
    print(f"{name:10s}: {best * 1000:7.2f} ms  (compile {compile_s:.0f}s)",
          flush=True)
    return best


# --- full step ---
def full_body(i, s):
    s2, _ = train_step(s, batch, jax.random.fold_in(rngk, i))
    return s2


bench("full", full_body, state)

# --- backbone fwd+bwd ---
variables = {"params": state.params, "batch_stats": state.batch_stats}
x_img = jnp.asarray(batch.images)


def backbone_loss(params, img):
    x = img.astype(jnp.bfloat16) / 255.0
    fm, _ = model.apply(
        {"params": params, "batch_stats": state.batch_stats},
        x, True,
        method=lambda m, x, t: m.convnet(x, train=t),
        mutable=["batch_stats"],
    )
    return jnp.sum(fm.astype(jnp.float32) ** 2)


bb_grad = jax.grad(backbone_loss)


def backbone_body(i, p):
    g = bb_grad(p, x_img)
    return jax.tree_util.tree_map(lambda a, b: a + 1e-12 * b, p, g)


bench("backbone", backbone_body, state.params)

# --- roipool fwd+bwd on a fixed feature map ---
from cova_tpu.ops.roi_pool_pallas import roi_pool_pallas  # noqa: E402

fm0 = jnp.zeros((B, H // 4, H // 4, 64), jnp.bfloat16)
boxes = jnp.asarray(batch.boxes, jnp.float32)
mask = jnp.asarray(batch.box_mask)


def roi_loss(fm):
    pooled = roi_pool_pallas(fm, boxes, mask, 0.25, 3, 3)
    return jnp.sum(pooled.astype(jnp.float32) ** 2)


roi_grad = jax.grad(roi_loss)


def roi_body(i, fm):
    return fm + 1e-12 * roi_grad(fm).astype(fm.dtype)


bench("roipool", roi_body, fm0 + 1.0)


# --- head: bbox encoder + GAT + decoder fwd+bwd, visual feats fixed ---
vis = jnp.ones((B, cfg.pad_boxes, 64 * 9), jnp.bfloat16)
ctx = jnp.asarray(batch.context_indices)


def head_loss(params, vis):
    def run(m, vis):
        own = jnp.concatenate(
            [vis, m.bbox_features(boxes, mask, True)], axis=-1
        )
        ctx_repr, _ = m.gat(own, ctx)
        combined = jnp.concatenate([own, ctx_repr], axis=-1)
        y = m.decoder_hidden(combined)
        y = m.decoder_bn(y, mask, use_running_average=False)
        y = jax.nn.relu(y)
        return m.decoder_out(y)

    logits, _ = model.apply(
        {"params": params, "batch_stats": state.batch_stats},
        vis, method=run, mutable=["batch_stats"],
    )
    return jnp.sum(logits.astype(jnp.float32) ** 2)


head_grad = jax.grad(head_loss)


def head_body(i, p):
    g = head_grad(p, vis)
    return jax.tree_util.tree_map(lambda a, b: a + 1e-12 * b, p, g)


bench("head", head_body, state.params)
