"""GAT layer: the TPU reformulation (project-then-gather, scalar-score
decomposition, dense neighborhood matmul) must match a literal numpy
transcription of the reference layer (models.py:171-208)."""

import jax
import jax.numpy as jnp
import numpy as np

from cova_tpu.models.gat import GraphAttention
from cova_tpu.ops.gat_attention import (
    gather_scalar,
    neighbor_aggregate,
    neighborhood_matrix,
)


def reference_gat(h, ctx, w_i, w_j, att_w, att_b, alpha=0.2):
    """Numpy transcription of the reference forward for ONE image:
    zero-row padding for -1, gather rows, project, concat-logit, leaky relu,
    -9e15 mask, softmax, weighted sum of projected neighbors."""
    n, k = ctx.shape
    f = h.shape[1]
    h_pad = np.concatenate([h, np.zeros((1, f), h.dtype)], 0)
    h_j = h_pad[ctx.reshape(-1)].reshape(n, k, f)
    wh_i = h @ w_i  # [n, H]
    wh_j = h_j @ w_j  # [n, k, H]
    cat = np.concatenate(
        [np.repeat(wh_i[:, None, :], k, axis=1), wh_j], axis=2
    )
    e = cat @ att_w[:, 0] + att_b[0]  # [n, k]
    e = np.where(e > 0, e, alpha * e)  # leaky relu
    e = np.where(ctx >= 0, e, -9e15)
    e = e - e.max(axis=1, keepdims=True)
    a = np.exp(e)
    a = a / a.sum(axis=1, keepdims=True)
    out = (a[:, :, None] * wh_j).sum(1)
    return out, a


def _case(rng, b=2, n=12, k=5, f=10, hd=8):
    h = rng.normal(size=(b, n, f)).astype(np.float32)
    ctx = rng.integers(-1, n, size=(b, n, k)).astype(np.int32)
    return h, ctx


def test_gather_scalar(rng):
    scores = rng.normal(size=(2, 6)).astype(np.float32)
    ctx = np.array(
        [[[0, 5, -1], [2, 2, 1]], [[-1, -1, -1], [3, 0, 4]]], np.int32
    )
    got = np.asarray(gather_scalar(jnp.asarray(scores), jnp.asarray(ctx)))
    for b in range(2):
        for p in range(2):
            for kk in range(3):
                c = ctx[b, p, kk]
                want = scores[b, c] if c >= 0 else 0.0
                assert got[b, p, kk] == want


def test_neighborhood_matrix_aggregate(rng):
    b, n, k, hd = 2, 7, 3, 4
    vals = rng.normal(size=(b, n, hd)).astype(np.float32)
    attn = rng.uniform(size=(b, n, k)).astype(np.float32)
    ctx = rng.integers(-1, n, size=(b, n, k)).astype(np.int32)
    got = np.asarray(
        neighbor_aggregate(
            jnp.asarray(vals), jnp.asarray(attn), jnp.asarray(ctx)
        )
    )
    want = np.zeros((b, n, hd), np.float32)
    for bb in range(b):
        for p in range(n):
            for kk in range(k):
                c = ctx[bb, p, kk]
                if c >= 0:
                    want[bb, p] += attn[bb, p, kk] * vals[bb, c]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # duplicate indices must accumulate
    a = neighborhood_matrix(jnp.asarray(attn), jnp.asarray(ctx), n)
    assert np.asarray(a).shape == (b, n, n)


def test_gat_matches_reference_semantics(rng):
    h, ctx = _case(rng)
    layer = GraphAttention(hidden_dim=8, dtype=jnp.float32)
    variables = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(h), jnp.asarray(ctx)
    )
    out, attn = layer.apply(variables, jnp.asarray(h), jnp.asarray(ctx))
    p = variables["params"]
    w_i = np.asarray(p["W_i"]["kernel"])  # [F, H]
    w_j = np.asarray(p["W_j"]["kernel"])
    att_w = np.asarray(p["att_w"])
    att_b = np.asarray(p["att_b"])
    for b in range(h.shape[0]):
        want_out, want_attn = reference_gat(
            h[b], ctx[b], w_i, w_j, att_w, att_b
        )
        np.testing.assert_allclose(
            np.asarray(out)[b], want_out, rtol=2e-4, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(attn)[b], want_attn, rtol=2e-4, atol=2e-6
        )


def test_gat_all_padded_row_is_finite(rng):
    """Rows whose context is entirely -1 (isolated/padded boxes) must not
    produce NaN (softmax over all -9e15)."""
    h = rng.normal(size=(1, 4, 6)).astype(np.float32)
    ctx = np.full((1, 4, 3), -1, np.int32)
    layer = GraphAttention(hidden_dim=5, dtype=jnp.float32)
    variables = layer.init(jax.random.PRNGKey(1), jnp.asarray(h), jnp.asarray(ctx))
    out, attn = layer.apply(variables, jnp.asarray(h), jnp.asarray(ctx))
    assert np.isfinite(np.asarray(out)).all()
    assert np.isfinite(np.asarray(attn)).all()


def test_gat_grads_flow(rng):
    h, ctx = _case(rng, b=1, n=6, k=3, f=5, hd=4)
    layer = GraphAttention(hidden_dim=4, dtype=jnp.float32)
    variables = layer.init(
        jax.random.PRNGKey(2), jnp.asarray(h), jnp.asarray(ctx)
    )

    def loss(params):
        out, _ = layer.apply({"params": params}, jnp.asarray(h), jnp.asarray(ctx))
        return jnp.sum(out**2)

    g = jax.grad(loss)(variables["params"])
    norms = [float(jnp.linalg.norm(x)) for x in jax.tree.leaves(g)]
    assert all(np.isfinite(norms))
    assert any(n > 0 for n in norms)
