"""Shared layers: torch-compatible initializers and masked BatchNorm.

The reference trains with torch defaults; to keep training dynamics
comparable we reproduce torch's ``nn.Linear``/``nn.Conv2d`` init
(kaiming-uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)) for kernel and bias) and
``BatchNorm1d`` semantics — including the subtlety that padded batches must
not pollute statistics: the reference normalizes over *all real boxes in a
batch* (``/root/reference/models.py:66-70,86``); our padded layout therefore
needs a mask-aware BatchNorm that (a) computes batch statistics over valid
rows only, (b) normalizes with the biased variance, and (c) updates running
stats with the unbiased variance — exactly torch's split.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# torch nn.Linear / nn.Conv2d default kernel init: U(+-1/sqrt(fan_in)).
torch_kernel_init = nn.initializers.variance_scaling(
    scale=1.0 / 3.0, mode="fan_in", distribution="uniform"
)


def torch_bias_init(fan_in: int):
    """torch default bias init: U(+-1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / (fan_in**0.5)
        return jax.random.uniform(
            key, shape, dtype, minval=-bound, maxval=bound
        )

    return init


class TorchLinear(nn.Module):
    """Dense layer with torch-default init."""

    features: int
    use_bias: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over the valid rows of a padded [..., F] tensor.

    Statistics reduce over *all* leading dims (the global batch — under a
    data-parallel mesh XLA turns these reductions into cross-replica
    collectives automatically), weighted by ``mask``. Matches torch
    ``BatchNorm1d(momentum=0.1, eps=1e-5, affine=True)``.
    """

    features: int
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    eps: float = 1e-5
    dtype: Any = None
    param_dtype: Any = jnp.float32
    # group_fold=g: the input carries g channel GROUPS of ``features`` each
    # ([..., g*features], group-major — e.g. the stem conv's s2d(2) output
    # (ey, ex, o) or a W-packed map (ex, c)); statistics fold over the
    # groups, so the math equals BatchNorm over the unpacked layout while
    # every pass runs on full 128-lane tiles (no C=64 padding tax).
    group_fold: int = 1

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray],
        use_running_average: bool,
        return_coefficients: bool = False,
    ):
        f = self.features
        g = self.group_fold
        assert x.shape[-1] == g * f, (x.shape, g, f)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((f,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((f,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (f,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (f,), self.param_dtype)

        xf = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            red = tuple(range(x.ndim - 1))
            if mask is None:
                # Unmasked (e.g. image-level BatchNorm2d over NHWC): plain
                # reductions, static count.
                cnt = jnp.float32(np.prod(x.shape[:-1]) * g)
                s1 = jnp.sum(xf, axis=red)
                s2 = jnp.sum(xf**2, axis=red)
                if g > 1:
                    s1 = s1.reshape(g, f).sum(0)
                    s2 = s2.reshape(g, f).sum(0)
                mean = s1 / cnt
                var = s2 / cnt - mean**2
            else:
                assert g == 1, "group_fold supports unmasked inputs only"
                m = mask.astype(jnp.float32)[..., None]
                cnt = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(xf * m, axis=red) / cnt
                var = jnp.sum((xf**2) * m, axis=red) / cnt - mean**2
            var = jnp.maximum(var, 0.0)
            if not self.is_initializing():
                # torch: running update uses the *unbiased* batch variance.
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                # An all-padding batch (mask sum 0) has no statistics —
                # skip the update instead of decaying the running stats
                # toward (0, 0) (torch never sees this case: the reference
                # has no padding).
                upd = (
                    jnp.float32(1.0) if mask is None
                    else (jnp.sum(mask) > 0).astype(jnp.float32)
                ) * self.momentum
                ra_mean.value = (1 - upd) * ra_mean.value + upd * mean
                ra_var.value = (1 - upd) * ra_var.value + upd * unbiased

        inv = jax.lax.rsqrt(var + self.eps)
        scale_eff = inv * scale.astype(jnp.float32)
        shift_eff = bias.astype(jnp.float32) - mean * scale_eff
        if return_coefficients:
            # Effective per-channel affine for a fused normalize kernel
            # ([features]-shaped even when group_fold > 1):
            # y = x * scale_eff + shift_eff  ==  (x - mean)*inv*scale + bias
            # (same stats/running-update math as the normalizing path).
            return scale_eff, shift_eff
        if g > 1:
            scale_eff = jnp.tile(scale_eff, g)
            shift_eff = jnp.tile(shift_eff, g)
        y = xf * scale_eff + shift_eff
        return y.astype(self.dtype or x.dtype)
