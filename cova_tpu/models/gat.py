"""Graph-attention context layer over the DOM-preorder K-neighborhood.

Semantics match the reference ``GraphAttentionLayer``
(``/root/reference/models.py:151-212``): two bias-free projections W_i / W_j,
a concat-MLP attention logit + LeakyReLU(0.2), -9e15 masking of padded
neighbors, softmax over the K axis, and an output that aggregates *projected*
neighbors ``Wh_j`` (no final nonlinearity, single head).

The computation is restructured for TPU (see ``ops/gat_attention.py``):
projections run before any gather, the attention logit decomposes into two
per-node scalars, and the weighted sum is one dense [P, P] x [P, H] matmul on
the MXU. Attention weights are always computed explicitly, preserving the
introspection path the reference exposes via ``return_attn_wts``
(``models.py:210-212``) for attention extraction/visualization.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.gat_attention import gather_scalar, neighbor_aggregate
from .layers import torch_bias_init, torch_kernel_init

NEG_INF = -9e15  # reference's mask value (models.py:202)


class GraphAttention(nn.Module):
    hidden_dim: int
    alpha: float = 0.2  # LeakyReLU slope (models.py:156,165)
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, h: jnp.ndarray, ctx_idx: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """h: [B, P, F]; ctx_idx: [B, P, K] per-image indices, -1 = pad.

        Returns (context_repr [B, P, H], attn_wts [B, P, K]).
        """
        dense = lambda name: nn.Dense(  # noqa: E731
            self.hidden_dim,
            use_bias=False,
            kernel_init=torch_kernel_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )
        wh_i = dense("W_i")(h)  # [B, P, H]
        wh_j = dense("W_j")(h)  # [B, P, H]

        # attention logit a . [Wh_i ; Wh_j] + b  ==  a1.Wh_i + a2.Wh_j + b.
        # Parameterized as one [2H] vector + scalar bias, mirroring the
        # reference's Linear(2H -> 1) (models.py:164).
        att_w = self.param(
            "att_w", torch_kernel_init, (2 * self.hidden_dim, 1),
            self.param_dtype,
        )
        att_b = self.param(
            "att_b", torch_bias_init(2 * self.hidden_dim), (1,),
            self.param_dtype,
        )
        a1 = att_w[: self.hidden_dim, 0].astype(wh_i.dtype)
        a2 = att_w[self.hidden_dim :, 0].astype(wh_j.dtype)

        s_i = jnp.einsum("bph,h->bp", wh_i, a1) + att_b[0].astype(wh_i.dtype)
        s_j_all = jnp.einsum("bph,h->bp", wh_j, a2)  # node-as-neighbor score
        s_j = gather_scalar(s_j_all, ctx_idx)  # [B, P, K]; -1 -> 0

        e = s_i[..., None] + s_j
        e = nn.leaky_relu(e, negative_slope=self.alpha)
        e = jnp.where(ctx_idx >= 0, e.astype(jnp.float32), NEG_INF)
        attn = nn.softmax(e, axis=-1).astype(h.dtype)

        ctx_repr = neighbor_aggregate(wh_j, attn, ctx_idx)  # [B, P, H]
        return ctx_repr, attn
