"""Neighbor gather / aggregation primitives for the GAT context layer.

The reference gathers full neighbor feature rows and projects them
(``/root/reference/models.py:180-208``): a ``[N, K, F]`` gather followed by a
``[N, K, F] x [F, H]`` matmul — K times more matmul FLOPs than necessary, and
a gather of wide rows, which TPUs hate.

TPU-native reformulation used here:
  * project **first** (``Wh_j = h @ W_j`` on the MXU), gather after —
    mathematically identical because gather commutes with a row-wise linear
    map, and the -1 "zero row" trick maps to a zero fill;
  * the attention logit ``a . [Wh_i ; Wh_j] + b`` splits into
    ``a1 . Wh_i + a2 . Wh_j + b`` so only **scalar** per-node scores are
    gathered;
  * the weighted neighbor sum becomes a dense neighborhood matrix
    ``A[n, m] = sum_k attn[n, k] * [ctx[n, k] == m]`` followed by one
    ``[P, P] @ [P, H]`` matmul — a systolic-array job instead of a scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_scalar(scores: jnp.ndarray, ctx_idx: jnp.ndarray) -> jnp.ndarray:
    """Per-image gather of per-node scalars.

    scores: [B, P]; ctx_idx: [B, P, K] with -1 padding.
    Returns [B, P, K]; padded slots are 0 (the reference's zero-feature row
    projects to score 0, ``models.py:180-186``).
    """
    safe = jnp.maximum(ctx_idx, 0)
    gathered = jax.vmap(jnp.take)(scores, safe)
    return jnp.where(ctx_idx >= 0, gathered, jnp.zeros((), scores.dtype))


def neighborhood_matrix(
    attn: jnp.ndarray, ctx_idx: jnp.ndarray, n_nodes: int
) -> jnp.ndarray:
    """Dense attention adjacency: A[b, n, m] = sum_k attn[b,n,k]*[ctx==m].

    attn: [B, P, K]; ctx_idx: [B, P, K] (-1 contributes nothing).
    Returns [B, P, P] in attn.dtype.
    """
    iota = jnp.arange(n_nodes, dtype=ctx_idx.dtype)
    onehot = (ctx_idx[..., None] == iota).astype(attn.dtype)  # [B,P,K,P]
    out = jnp.einsum(
        "bpk,bpkm->bpm", attn, onehot, preferred_element_type=jnp.float32
    )
    return out.astype(attn.dtype)


def neighbor_aggregate(
    values: jnp.ndarray, attn: jnp.ndarray, ctx_idx: jnp.ndarray
) -> jnp.ndarray:
    """out[b, n] = sum_k attn[b, n, k] * values[b, ctx[b, n, k]].

    values: [B, P, H]; attn/ctx_idx: [B, P, K]. MXU path: build the [B, P, P]
    neighborhood matrix and matmul.
    """
    a = neighborhood_matrix(attn, ctx_idx, values.shape[1])
    # Accumulate in f32 even under bf16 compute: up to K (=2*context_size)
    # contributions per row, and MXU f32 accumulation is free. The reference
    # accumulates in f32 throughout (torch bmm, models.py:206-208).
    out = jnp.einsum(
        "bpm,bmh->bph", a, values, preferred_element_type=jnp.float32
    )
    return out.astype(values.dtype)
