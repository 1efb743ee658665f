"""Space-to-depth stem conv vs the direct XLA conv (values and gradients)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cova_tpu.ops.conv_stem import stem_conv, stem_conv_reference


@pytest.mark.parametrize("h", [16, 64])
@pytest.mark.parametrize("seed", [0, 1])
def test_matches_direct_conv(h, seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(2, h, h, 3)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(7, 7, 3, 8)).astype(np.float32) * 0.1)
    got = stem_conv(x, k)
    want = stem_conv_reference(x, k)
    assert got.shape == want.shape == (2, h // 2, h // 2, 8)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_kernel_gradient_matches():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 3)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(7, 7, 3, 4)).astype(np.float32) * 0.1)

    def loss_fast(k):
        return jnp.sum(stem_conv(x, k) ** 2)

    def loss_ref(k):
        return jnp.sum(stem_conv_reference(x, k) ** 2)

    g_fast = jax.grad(loss_fast)(k)
    g_ref = jax.grad(loss_ref)(k)
    np.testing.assert_allclose(
        np.asarray(g_fast), np.asarray(g_ref), rtol=1e-3, atol=1e-4
    )


def test_rectangular_input():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 32, 16, 3)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(7, 7, 3, 4)).astype(np.float32) * 0.1)
    np.testing.assert_allclose(
        np.asarray(stem_conv(x, k)),
        np.asarray(stem_conv_reference(x, k)),
        rtol=1e-4,
        atol=1e-5,
    )
