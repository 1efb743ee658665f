"""COVA_REMAT: per-block rematerialization must be a pure memory/FLOPs
trade — identical param/stat tree paths (checkpoint interchange, and the
torch_port key contract at utils/torch_port.py:72/148), identical outputs,
identical grads. The flag exists for deep-backbone/high-res configs: the
BASELINE stretch (RN50 + 2560px, B=2) needs 18.19 G of 15.75 G HBM without
it (artifacts/tpu_r5/stretch_full.err)."""

import jax
import jax.numpy as jnp
import pytest

from cova_tpu.models.resnet import make_backbone


def _init_and_apply(name, x, remat, monkeypatch):
    monkeypatch.setenv("COVA_REMAT", "1" if remat else "0")
    bb = make_backbone(name)
    variables = bb.init(jax.random.PRNGKey(0), x, train=True)
    out, _ = bb.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )

    def loss(params):
        y, _ = bb.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x,
            train=True,
            mutable=["batch_stats"],
        )
        return (y.astype(jnp.float32) ** 2).mean()

    grads = jax.grad(loss)(variables["params"])
    return variables, out, grads


# resnet50 covers Bottleneck auto-name replication across 4 stages;
# resnet18_stem covers the packed-W BasicBlock path (name= must compose
# with packed=True kwargs); resnet18 covers downsample blocks (Conv_2).
@pytest.mark.parametrize("name", ["resnet18_stem", "resnet18", "resnet50"])
def test_remat_is_a_pure_memory_trade(name, monkeypatch):
    x = jnp.linspace(0, 1, 2 * 64 * 64 * 3, dtype=jnp.float32).reshape(
        2, 64, 64, 3
    )
    v0, out0, g0 = _init_and_apply(name, x, False, monkeypatch)
    v1, out1, g1 = _init_and_apply(name, x, True, monkeypatch)

    # Tree paths identical -> checkpoints interchange between modes.
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(
        v1
    )
    # Same init (same RNG plumbing through the lifted transform).
    for a, b in zip(jax.tree_util.tree_leaves(v0), jax.tree_util.tree_leaves(v1)):
        assert jnp.array_equal(a, b)
    assert jnp.array_equal(out0, out1)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        assert jnp.allclose(a, b, rtol=1e-5, atol=1e-6)
