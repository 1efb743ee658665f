"""Measure the semantic effect of partial-batch page cycling.

``pad_batch`` fills a partial last train batch by CYCLING real pages
(``data/batching.py:70-101``). The reference never pads — its last batch
is simply smaller (``/root/reference/train.py:60-76``) — so the image-level
BatchNorm batch statistics differ: cycled duplicates get extra weight in
the batch mean/var, while the reference computes them over the smaller
ragged batch. This script quantifies that deviation directly:

  * run one train step on a b-page partial batch padded to B (product
    path) and on the same b pages compiled at their true size B=b
    (reference semantics, bit-exact baseline);
  * report the relative deltas of loss_sum, parameter updates, and the
    updated BN running statistics.

Usage: JAX_PLATFORMS=cpu python scripts/measure_partial_batch.py
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402

from cova_tpu.config import Config
from cova_tpu.data.batching import collate, pad_batch
from cova_tpu.data.records import pad_page
from cova_tpu.data.synthetic import synth_image, synth_record
from cova_tpu.models.cova import build_model
from cova_tpu.train.steps import create_train_state, train_step


def _batch(n_pages, img_h, pad_boxes, cs):
    imgs, pages = [], []
    for i in range(n_pages):
        rng = np.random.default_rng((17, i))
        rec = synth_record(str(i), img_h, rng, min_boxes=10, max_boxes=20)
        imgs.append(synth_image(rec, img_h, rng))
        pages.append(pad_page(rec, pad_boxes, cs))
    return collate(imgs, pages)


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    denom = np.abs(b).max()
    return float(np.abs(a - b).max() / denom) if denom else 0.0


def main(img_h=256, b=3, target_b=8):
    cfg = Config(
        img_height=img_h, max_boxes=24, context_size=3, hidden_dim=64,
        bbox_hidden_dim=16, batch_size=target_b, compute_dtype="float32",
        drop_prob=0.0,
    )
    ragged = _batch(b, img_h, cfg.pad_boxes, cfg.context_size)
    cycled, _ = pad_batch(ragged, target_b)

    model = build_model(cfg)
    rng = jax.random.PRNGKey(1)
    state = create_train_state(model, cfg, cycled, jax.random.PRNGKey(0))

    from jax.flatten_util import ravel_pytree

    from cova_tpu.train.steps import _apply, masked_ce_sum

    # Raw gradients at identical params (post-Adam param deltas are
    # dominated by sign flips on near-zero-grad tensors — rsqrt
    # renormalization turns any epsilon disagreement into a full +/-lr
    # step, which says nothing about the BN-stat deviation under study).
    def loss_and_grads(batch):
        def loss_fn(params):
            out, new_vars = _apply(state, params, batch, train=True, rng=rng)
            loss = masked_ce_sum(out.logits, batch.labels, batch.box_mask)
            return loss, new_vars["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        return loss, grads, stats

    l_cyc, g_cyc, s_cyc = loss_and_grads(cycled)
    l_ref, g_ref, s_ref = loss_and_grads(ragged)

    flat_c = np.asarray(ravel_pytree(g_cyc)[0], np.float64)
    flat_r = np.asarray(ravel_pytree(g_ref)[0], np.float64)
    cos = float((flat_c @ flat_r)
                / (np.linalg.norm(flat_c) * np.linalg.norm(flat_r)))
    grad_rel = float(np.linalg.norm(flat_c - flat_r)
                     / np.linalg.norm(flat_r))

    bn_c = jax.tree_util.tree_leaves_with_path(s_cyc)
    bn_r = {jax.tree_util.keystr(k): v
            for k, v in jax.tree_util.tree_leaves_with_path(s_ref)}
    bn_delta = max(_rel(v, bn_r[jax.tree_util.keystr(k)]) for k, v in bn_c)

    out = {
        "backend": jax.devices()[0].platform,
        "img_height": img_h,
        "pages": b,
        "padded_to": target_b,
        "loss_cycled": float(l_cyc),
        "loss_ragged": float(l_ref),
        "loss_rel_delta": _rel(l_cyc, l_ref),
        "grad_cosine_similarity": cos,
        "grad_rel_l2_delta": grad_rel,
        "max_bn_running_stat_rel_delta": bn_delta,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
