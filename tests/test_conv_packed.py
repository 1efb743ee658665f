"""W-packed layer1 layout (ops/conv_packed + the packed BasicBlock path).

The packed domain must be a pure relabeling: conv values/gradients and BN
statistics identical to the unpacked path (reference semantics:
``/root/reference/models.py:48-56`` layer1), with the SAME param/stat tree
(checkpoint interchangeability).
"""

import os

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest

from cova_tpu.models.resnet import make_backbone
from cova_tpu.ops.conv3x3 import conv3x3_reference
from cova_tpu.ops.conv_packed import (
    pack_kernel3x3,
    pack_w,
    packed_conv3x3,
    unpack_w,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_pack_unpack_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 6, 8, 4)).astype(np.float32))
    assert jnp.array_equal(unpack_w(pack_w(x)), x)
    # pack_w is the (w, c) -> (w/2, (ex c)) regrouping.
    xp = pack_w(x)
    np.testing.assert_array_equal(
        np.asarray(xp[0, 0, 0]),
        np.concatenate([np.asarray(x[0, 0, 0]), np.asarray(x[0, 0, 1])]),
    )


def test_packed_kernel_flops_layout(rng):
    k = jnp.asarray(rng.normal(size=(3, 3, 4, 5)).astype(np.float32))
    kp = pack_kernel3x3(k)
    assert kp.shape == (3, 3, 8, 10)
    # Exactly the 9 logical taps land per output slot; the rest are zero.
    nz = np.count_nonzero(np.asarray(kp))
    assert nz == 9 * 4 * 5 * 2  # both output parities carry all taps


def test_packed_conv_matches_reference(rng):
    x = jnp.asarray(rng.normal(size=(2, 10, 16, 8)).astype(np.float32))
    k = jnp.asarray((rng.normal(size=(3, 3, 8, 6)) * 0.2).astype(np.float32))
    ref = conv3x3_reference(x, k)
    got = unpack_w(packed_conv3x3(pack_w(x), k))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_conv_gradients_match(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 12, 4)).astype(np.float32))
    k = jnp.asarray((rng.normal(size=(3, 3, 4, 4)) * 0.2).astype(np.float32))

    def f_ref(k, x):
        return jnp.sum(conv3x3_reference(x, k) ** 2)

    def f_pk(k, x):
        return jnp.sum(unpack_w(packed_conv3x3(pack_w(x), k)) ** 2)

    gk_r, gx_r = jax.grad(f_ref, argnums=(0, 1))(k, x)
    gk_p, gx_p = jax.grad(f_pk, argnums=(0, 1))(k, x)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)


def test_backbone_packed_matches_unpacked(rng, monkeypatch):
    """Same init, both layouts: forward, batch stats, and param gradients
    agree; the variable trees are identical (checkpoint-compatible)."""
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    m = make_backbone("resnet18_stem")
    monkeypatch.setenv("COVA_PACKED_W", "0")
    v = m.init(jax.random.PRNGKey(0), x, True)
    out_u, mut_u = m.apply(v, x, True, mutable=["batch_stats"])
    monkeypatch.setenv("COVA_PACKED_W", "1")
    v_p = m.init(jax.random.PRNGKey(0), x, True)
    assert jtu.tree_structure(v) == jtu.tree_structure(v_p)
    assert jtu.tree_map(lambda a: a.shape, v) == jtu.tree_map(
        lambda a: a.shape, v_p
    )
    out_p, mut_p = m.apply(v, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_u),
                               rtol=1e-4, atol=1e-4)
    jtu.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        mut_p["batch_stats"],
        mut_u["batch_stats"],
    )

    def loss(p, packed):
        monkeypatch.setenv("COVA_PACKED_W", "1" if packed else "0")
        out, _ = m.apply(
            {"params": p, "batch_stats": v["batch_stats"]}, x, True,
            mutable=["batch_stats"],
        )
        return jnp.sum(out**2)

    g_u = jax.grad(lambda p: loss(p, False))(v["params"])
    g_p = jax.grad(lambda p: loss(p, True))(v["params"])
    jtu.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b),
            rtol=1e-3, atol=1e-3 * float(jnp.abs(a).max() + 1e-9),
        ),
        g_u, g_p,
    )


def test_odd_width_falls_back(rng, monkeypatch):
    """A W that is odd after the stem keeps the unpacked path (no crash)."""
    monkeypatch.setenv("COVA_PACKED_W", "1")
    # H=W=24 -> stem W = 6 (even, packs); H=W=20 -> stem W = 5 (odd).
    x = jnp.asarray(rng.normal(size=(1, 20, 20, 3)).astype(np.float32))
    m = make_backbone("resnet18_stem")
    v = m.init(jax.random.PRNGKey(0), x, True)
    out, _ = m.apply(v, x, True, mutable=["batch_stats"])
    assert out.shape == (1, 5, 5, 64)
