"""Fused BN-normalize + ReLU + 3x3/2 max-pool Pallas kernel vs the unfused
XLA path (values and gradients), plus the backbone integration.

The kernel's tie order (lowest phase group / shifted candidate wins) differs
from ``jnp.maximum``-chain autodiff only at exact float ties, so gradient
tests use strictly-unique f32 inputs (a scaled permutation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cova_tpu.ops.bn_pool import (
    bn_relu_pool_s2d,
    bn_relu_pool_supported,
)
from cova_tpu.ops.conv_stem import stem_pool_s2d


def _unique_ys(b, u, v, c4, seed=0):
    rng = np.random.default_rng(seed)
    n = b * u * v * c4
    vals = (rng.permutation(n).astype(np.float64) / n * 4.0 - 2.0).astype(
        np.float32
    )
    return jnp.asarray(vals.reshape(b, u, v, c4))


def _oracle(ys, scale, shift):
    z = ys.astype(jnp.float32) * jnp.tile(scale, 4) + jnp.tile(shift, 4)
    z = jnp.maximum(z, 0.0).astype(ys.dtype)
    return stem_pool_s2d(z)


@pytest.mark.parametrize("u", [16, 32])
@pytest.mark.parametrize("o", [8, 16])
def test_forward_matches_unfused(u, o):
    rng = np.random.default_rng(u + o)
    ys = _unique_ys(2, u, 16, 4 * o, seed=u * o)
    scale = jnp.asarray(rng.normal(size=(o,)).astype(np.float32))
    shift = jnp.asarray(rng.normal(size=(o,)).astype(np.float32))
    assert bn_relu_pool_supported(ys.shape)
    got = bn_relu_pool_s2d(ys, scale, shift, interpret=True)
    want = _oracle(ys, scale, shift)
    assert got.shape == want.shape == (2, u, 16, o)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_gradients_match_unfused():
    o = 8
    ys = _unique_ys(2, 16, 16, 4 * o, seed=7)
    rng = np.random.default_rng(7)
    scale = jnp.asarray(
        (np.abs(rng.normal(size=(o,))) + 0.1).astype(np.float32)
    )
    shift = jnp.asarray(rng.normal(size=(o,)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(2, 16, 16, o)).astype(np.float32))

    def mkloss(f):
        def loss(ys, scale, shift):
            return jnp.sum(f(ys, scale, shift).astype(jnp.float32) * w)

        return loss

    gk = jax.grad(
        mkloss(lambda *a: bn_relu_pool_s2d(*a, interpret=True)),
        argnums=(0, 1, 2),
    )(ys, scale, shift)
    go = jax.grad(mkloss(_oracle), argnums=(0, 1, 2))(ys, scale, shift)
    for name, a, b in zip(["dys", "dscale", "dshift"], gk, go):
        np.testing.assert_allclose(
            np.asarray(a),
            np.asarray(b),
            rtol=1e-4,
            atol=1e-5,
            err_msg=name,
        )


def test_unsupported_geometry_falls_back():
    # v % 8 != 0 -> XLA fallback, still correct.
    o = 8
    rng = np.random.default_rng(3)
    ys = _unique_ys(1, 16, 12, 4 * o, seed=3)
    scale = jnp.asarray(rng.normal(size=(o,)).astype(np.float32))
    shift = jnp.asarray(rng.normal(size=(o,)).astype(np.float32))
    assert not bn_relu_pool_supported(ys.shape)
    got = bn_relu_pool_s2d(ys, scale, shift, interpret=True)
    want = _oracle(ys, scale, shift)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_backbone_fused_path_matches_unfused(monkeypatch):
    """The resnet stem with COVA_FUSED_POOL=1 (interpret) equals the default
    unfused path — same params, same batch stats updates, same output."""
    from cova_tpu.models.resnet import make_backbone

    mod = make_backbone("resnet18_stem")
    rng = np.random.default_rng(11)
    # 64x64 -> s2d stem output [1, 16, 16, 256]: tu=8, 2 tiles (kernel path).
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), x, True)

    def run(fused):
        monkeypatch.setenv("COVA_FUSED_POOL", "1" if fused else "0")
        y, mut = mod.apply(
            variables, x, True, mutable=["batch_stats"]
        )
        return y, mut["batch_stats"]

    y1, bs1 = run(True)
    y0, bs0 = run(False)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), rtol=1e-4, atol=1e-4
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        bs1,
        bs0,
    )


def test_gradients_multi_tile_middle_tiles():
    """u=40 resolves to tu=8 -> 5 tiles, exercising middle tiles (both
    halo rows real) — 2-tile cases only cover the first/last edge paths."""
    o = 8
    ys = _unique_ys(1, 40, 16, 4 * o, seed=13)
    rng = np.random.default_rng(13)
    scale = jnp.asarray(
        (np.abs(rng.normal(size=(o,))) + 0.1).astype(np.float32)
    )
    shift = jnp.asarray(rng.normal(size=(o,)).astype(np.float32))
    from cova_tpu.ops.bn_pool import _pick_tu

    assert _pick_tu(40) == 8  # 5 tiles
    w = jnp.asarray(rng.normal(size=(1, 40, 16, o)).astype(np.float32))

    def mkloss(f):
        def loss(ys, scale, shift):
            return jnp.sum(f(ys, scale, shift).astype(jnp.float32) * w)

        return loss

    gk = jax.grad(
        mkloss(lambda *a: bn_relu_pool_s2d(*a, interpret=True)),
        argnums=(0, 1, 2),
    )(ys, scale, shift)
    go = jax.grad(mkloss(_oracle), argnums=(0, 1, 2))(ys, scale, shift)
    for name, a, b in zip(["dys", "dscale", "dshift"], gk, go):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=name,
        )
