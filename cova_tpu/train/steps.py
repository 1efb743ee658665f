"""Compiled train / eval steps: loss, optimizer, metrics.

Rebuilds the reference training engine's per-batch math
(``/root/reference/train.py:31-71`` and ``main.py:133-139``) as pure jitted
functions over padded batches:

  * loss = summed cross-entropy over **valid** boxes — the reference uses
    ``CrossEntropyLoss(reduction="sum")`` over all (real) boxes
    (``main.py:139``); with padding, masking reproduces the same sum and the
    same per-batch gradient scale;
  * optimizer = torch-style Adam with additive L2 weight decay
    (``torch.optim.Adam(lr, weight_decay)``, ``main.py:133-135`` — decay is
    added to the gradient *before* the moment updates, unlike AdamW);
  * train accuracy counts argmax-correct over all valid boxes incl. BG
    (``train.py:53-54``);
  * the eval metric is the reference's retrieval-style top-1
    (``train.py:131-154``): per page and per non-BG class, correct iff the
    true box is the highest-scoring box for that class.

Buffers are donated; the whole step is one XLA program on the mesh.
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..data.batching import Batch


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)


def make_optimizer(learning_rate: float, weight_decay: float):
    """torch ``Adam(lr, weight_decay=wd)``: grad += wd * param, then Adam
    moments, then the (constant — the reference's StepLR is a deliberate
    no-op, ``main.py:136-138``) learning rate."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-learning_rate),
    )


def create_train_state(model, cfg, example_batch: Batch, rng) -> TrainState:
    variables = model.init(
        rng,
        jnp.asarray(example_batch.images),
        jnp.asarray(example_batch.boxes),
        jnp.asarray(example_batch.box_mask),
        jnp.asarray(example_batch.context_indices),
        jnp.asarray(example_batch.additional_feats)
        if example_batch.additional_feats.shape[-1] > 0
        else None,
        train=False,
    )
    tx = make_optimizer(cfg.learning_rate, cfg.weight_decay)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
        apply_fn=model.apply,
    )


def _apply(state, params, batch: Batch, train: bool, rng=None):
    feats = (
        batch.additional_feats
        if batch.additional_feats.shape[-1] > 0
        else None
    )
    kwargs = dict(train=train)
    if train:
        kwargs["rngs"] = {"dropout": rng}
    return state.apply_fn(
        {"params": params, "batch_stats": state.batch_stats},
        batch.images,
        batch.boxes,
        batch.box_mask,
        batch.context_indices,
        feats,
        mutable=["batch_stats"] if train else False,
        **kwargs,
    )


def masked_ce_sum(logits, labels, mask) -> jnp.ndarray:
    """Summed cross-entropy over valid boxes (f32)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask.astype(jnp.float32))


@functools.partial(jax.jit, donate_argnums=(0,))
def train_step(
    state: TrainState, batch: Batch, rng
) -> Tuple[TrainState, dict]:
    def loss_fn(params):
        out, new_vars = _apply(state, params, batch, train=True, rng=rng)
        loss = masked_ce_sum(out.logits, batch.labels, batch.box_mask)
        return loss, (new_vars["batch_stats"], out.logits)

    (loss, (new_stats, logits)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    preds = jnp.argmax(logits, axis=-1)
    maskf = batch.box_mask.astype(jnp.float32)
    metrics = {
        "loss_sum": loss,
        "n_correct": jnp.sum((preds == batch.labels) * maskf),
        "n_boxes": jnp.sum(maskf),
    }
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_stats,
        opt_state=new_opt,
    )
    return new_state, metrics


def retrieval_metric(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    mask: jnp.ndarray,
    n_classes: int,
    k: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference eval metric (``train.py:131-154``), vectorized over pages.

    For each page and class c in 1..n_classes-1: correct iff the index of the
    (first) ground-truth class-c box is among the top-``k`` boxes ranked by
    the class-c logit column over valid boxes — the reference takes the last
    ``k`` rows of an ascending per-column ``argsort`` (``train.py:144-153``);
    ``jax.lax.top_k`` over the -inf-masked column is the same set. ``k`` is
    static (it shapes the top_k output). Returns (correct [B, n_classes-1]
    bool, present [B, n_classes-1] bool).

    Tie-breaking (documented divergence, measure-zero on float logits): when
    two boxes share the exact k-th logit value, the reference's ascending
    ``argsort`` keeps the HIGHEST index (numpy argsort stability + last-k
    slice), while ``top_k`` prefers the LOWEST index. The hit test is a set-
    membership over the chosen k indices, so the outcomes differ only when
    the tie straddles the k-boundary AND one of the tied boxes is the true
    one — pinned by ``tests/test_metrics.py::test_retrieval_tie_breaking``.
    """
    neg = jnp.asarray(-jnp.inf, jnp.float32)
    masked = jnp.where(mask[..., None], logits.astype(jnp.float32), neg)
    corrects, presents = [], []
    for c in range(1, n_classes):
        _, topk_idx = jax.lax.top_k(masked[..., c], k)  # [B, k]
        is_c = (labels == c) & mask
        present = jnp.any(is_c, axis=1)
        true_idx = jnp.argmax(is_c, axis=1)  # first class-c box
        hit = jnp.any(topk_idx == true_idx[:, None], axis=1)
        corrects.append(hit & present)
        presents.append(present)
    return jnp.stack(corrects, 1), jnp.stack(presents, 1)


@functools.partial(jax.jit, static_argnames=("n_classes", "k"))
def eval_step(state: TrainState, batch: Batch, n_classes: int = 4, k: int = 1):
    """Inference + retrieval metric. BN uses running stats, dropout off
    (reference ``model.eval()``, ``train.py:112``)."""
    out = _apply(state, state.params, batch, train=False)
    correct, present = retrieval_metric(
        out.logits, batch.labels, batch.box_mask, n_classes, k=k
    )
    return {"correct": correct, "present": present, "logits": out.logits}


@functools.partial(jax.jit, static_argnames=("n_classes", "k"))
def eval_chunk_step(
    state: TrainState, batches: Batch, n_classes: int = 4, k: int = 1
) -> jnp.ndarray:
    """Metric over a CHUNK of eval batches in one dispatch.

    ``batches``: a Batch pytree whose leaves carry a leading chunk dim
    [G, B, ...]; the body compiles once and ``lax.scan``s over G. This makes
    the eval epoch's dispatch count ceil(n_batches / G) instead of
    n_batches — the per-dispatch round-trip (significant through
    high-latency links) amortizes over G batches. Returns correctness
    [G, B, n_classes-1].
    """

    def body(b: Batch) -> jnp.ndarray:
        out = _apply(state, state.params, b, train=False)
        correct, _ = retrieval_metric(
            out.logits, b.labels, b.box_mask, n_classes, k=k
        )
        return correct

    return jax.lax.map(body, batches)


@jax.jit
def forward_step(state: TrainState, batch: Batch):
    """Plain inference returning logits + attention weights."""
    return _apply(state, state.params, batch, train=False)
