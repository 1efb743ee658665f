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


def test_pre_s2d_input_matches_raw():
    """Host-side s2d(4) input (collate's layout) gives the same stem conv
    output as the raw [B, H, W, 3] image."""
    from cova_tpu.ops.conv_stem import s2d4_host, stem_conv_s2d

    rng = np.random.default_rng(5)
    x = rng.integers(0, 255, (2, 32, 32, 3), np.uint8)
    k = jnp.asarray(rng.normal(size=(7, 7, 3, 8)).astype(np.float32) * 0.1)
    raw = jnp.asarray(x).astype(jnp.float32)
    pre = jnp.asarray(
        np.stack([s2d4_host(im) for im in x], 0)
    ).astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(stem_conv_s2d(pre, k)),
        np.asarray(stem_conv_s2d(raw, k)),
        rtol=1e-5,
        atol=1e-4,
    )


def test_backbone_pre_s2d_matches_raw():
    from cova_tpu.models.resnet import make_backbone
    from cova_tpu.ops.conv_stem import s2d4_host

    mod = make_backbone("resnet18_stem")
    rng = np.random.default_rng(6)
    x = rng.integers(0, 255, (1, 32, 32, 3), np.uint8)
    raw = jnp.asarray(x).astype(jnp.float32) / 255.0
    pre = jnp.asarray(np.stack([s2d4_host(im) for im in x], 0)).astype(
        jnp.float32
    ) / 255.0
    variables = mod.init(jax.random.PRNGKey(0), raw, False)
    y_raw = mod.apply(variables, raw, False)
    y_pre = mod.apply(variables, pre, False)
    np.testing.assert_allclose(
        np.asarray(y_pre), np.asarray(y_raw), rtol=1e-4, atol=1e-4
    )
