"""Pallas im2col 3x3 conv (interpret mode) vs lax.conv: values + grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cova_tpu.ops.conv3x3 import conv3x3, conv3x3_reference


@pytest.mark.parametrize("shape", [(1, 8, 8, 4), (2, 12, 10, 8)])
def test_forward_matches(shape):
    rng = np.random.default_rng(0)
    b, h, w, c = shape
    o = 8
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, c, o)).astype(np.float32) * 0.1)
    got = conv3x3(x, k, 16, True)
    want = conv3x3_reference(x, k)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_partial_tiles():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 10, 10, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 4, 4)).astype(np.float32) * 0.1)
    # (10+2)^2 = 144 rows with m_tile 40 -> ragged last tile
    got = conv3x3(x, k, 40, True)
    want = conv3x3_reference(x, k)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_gradients_match():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 4, 6)).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.normal(size=(1, 8, 8, 6)).astype(np.float32))

    def loss_pallas(x, k):
        return jnp.sum(conv3x3(x, k, 16, True) * g)

    def loss_ref(x, k):
        return jnp.sum(conv3x3_reference(x, k) * g)

    dx_p, dk_p = jax.grad(loss_pallas, argnums=(0, 1))(x, k)
    dx_r, dk_r = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(
        np.asarray(dx_p), np.asarray(dx_r), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(dk_p), np.asarray(dk_r), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("shape,m_tile", [
    ((1, 8, 8, 4), 16), ((2, 12, 10, 8), 40), ((1, 10, 10, 4), 48),
])
def test_roll_variant_forward_matches(shape, m_tile):
    from cova_tpu.ops.conv3x3 import conv3x3_roll

    rng = np.random.default_rng(3)
    b, h, w, c = shape
    o = 8
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, c, o)).astype(np.float32) * 0.1)
    got = conv3x3_roll(x, k, m_tile, True)
    want = conv3x3_reference(x, k)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )
