"""ResNet backbones in Flax (NHWC, bf16-friendly).

The reference truncates an ImageNet ResNet-18 after ``layer1``
(``/root/reference/models.py:48-56``): conv1(7x7/2) -> bn -> relu ->
maxpool(3x3/2) -> two 64-channel basic blocks, i.e. output stride 4 with 64
channels. That truncated stem is the default backbone here, built natively in
NHWC so XLA tiles the convs straight onto the MXU. Full ResNet-18/34/50 are
also provided for the scaled "stretch" configuration (BASELINE.json), with
configurable truncation.

Weights: trains from scratch by default (no hub download — this environment
has no egress); ``cova_tpu.utils.torch_port.port_resnet_state_dict`` converts
a torchvision ``state_dict`` when one is available on disk.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv_stem import (
    stem_conv,
    stem_conv_reference,
    stem_conv_s2d,
    stem_pool_s2d,
)

Conv = partial(nn.Conv, use_bias=False, kernel_init=nn.initializers.he_normal())


class Conv3x3(nn.Module):
    """Stride-1 3x3 conv through the Pallas im2col kernel on TPU
    (``ops/conv3x3.py``), ``lax.conv`` elsewhere. Same param path/shape as
    ``nn.Conv`` (``kernel`` [3, 3, C, F])."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (3, 3, x.shape[-1], self.features),
            jnp.float32,
        )
        from ..ops.conv3x3 import conv3x3_auto

        return conv3x3_auto(x.astype(self.dtype or x.dtype), kernel)


class PackedConv3x3(nn.Module):
    """Stride-1 3x3 conv on a W-packed map ([B, H, W/2, 2C], see
    ``ops/conv_packed``). The parameter keeps the LOGICAL [3, 3, C, F]
    shape/path — checkpoints and torch ports are layout-independent; the
    packed [3, 3, 2C, 2F] kernel is scattered from it inside the op."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, xp):
        cin = xp.shape[-1] // 2
        kernel = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (3, 3, cin, self.features),
            jnp.float32,
        )
        from ..ops.conv_packed import packed_conv3x3

        return packed_conv3x3(xp.astype(self.dtype or xp.dtype), kernel)


def use_packed_w() -> bool:
    """Run the 64-channel stage W-packed ([B, H, W/2, 128]: exact lane
    tiles, ~145 vs ~67 TFLOP/s convs — scripts/bench_packed_layout.py).
    ``COVA_PACKED_W=0`` restores the unpacked layout."""
    import os

    return os.environ.get("COVA_PACKED_W", "1") != "0"


def use_remat() -> bool:
    """Rematerialize each backbone block's activations in the backward
    (``jax.checkpoint`` via ``nn.remat``): stores only block INPUTS between
    forward and backward, trading ~1 extra block forward of FLOPs for the
    per-block temp footprint. Off by default — the flagship truncated stem
    fits comfortably; ``COVA_REMAT=1`` turns it on for deep-backbone /
    high-res configs (the BASELINE stretch RN50+2560px step needs 18.19 G
    of 15.75 G HBM without it, artifacts/tpu_r5/stretch_full.err).

    Measured cost at RN50/1280px/B=2 on a v5e, where both modes fit:
    94.68 -> 103.58 ms/step (+9.4%, artifacts/tpu_r5/remat_ab_rn50_*.out)
    — the recompute is mostly MXU-cheap convs while the step is partly
    HBM-bound, so the classic "~1/3 extra" FLOPs estimate overstates it.

    Param/stat tree paths are remat-invariant (blocks get their auto-names
    explicitly when wrapped; pinned by tests/test_remat.py), so checkpoints
    interchange between the two modes.
    """
    import os

    return os.environ.get("COVA_REMAT", "0") == "1"


class StemConv(nn.Module):
    """7x7/2 RGB conv through the MXU-shaped space-to-depth formulation
    (``ops/conv_stem.py``). Parameter path/shape (``kernel`` [7, 7, 3, F])
    matches ``nn.Conv`` so checkpoints and torch ports are layout-stable.

    With ``s2d_output=True`` the result stays in s2d(2) form
    [B, H/4, W/4, 4*F] (channel order (ey, ex, f)) so BN/ReLU/maxpool can be
    fused downstream without the un-s2d rearrange.
    """

    features: int
    dtype: Any = None
    s2d_output: bool = False

    @nn.compact
    def __call__(self, x):
        # Accept either the raw RGB image or its host-side s2d(4) form
        # (48 = 16*3 channels, ``ops.conv_stem.s2d4_host``); the kernel
        # parameter stays [7, 7, 3, F] in both cases. The channel count IS
        # the layout flag — reject anything that is neither so a genuine
        # 48-channel raw input can't be silently misrouted.
        assert x.shape[-1] in (3, 48), (
            f"StemConv expects RGB (3) or s2d(4) (48) channels, got "
            f"{x.shape[-1]}"
        )
        pre_s2d = x.shape[-1] == 48
        cin = 3 if pre_s2d else x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (7, 7, cin, self.features),
            jnp.float32,
        )
        x = x.astype(self.dtype or x.dtype)
        if pre_s2d or (x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0):
            if self.s2d_output:
                return stem_conv_s2d(x, kernel)
            return stem_conv(x, kernel)
        assert not self.s2d_output
        return stem_conv_reference(x, kernel)


class BatchNorm(nn.Module):
    """torch-exact BatchNorm2d wrapper (momentum 0.1, eps 1e-5).

    Uses MaskedBatchNorm (mask=None) rather than flax ``nn.BatchNorm``: the
    flax version updates running variance with the *biased* batch variance,
    torch with the *unbiased* one — a small but real parity gap when porting
    or serving torch checkpoints. The inner module is named ``BatchNorm_0``
    so parameter/stat tree paths stay identical to the flax layout used by
    round-1 checkpoints and ``utils.torch_port``.
    """

    dtype: Any = None
    # See MaskedBatchNorm.group_fold: the input carries group_fold channel
    # groups (s2d parities / W-packing); params and stats stay at the
    # logical channel count, so tree paths are layout-independent.
    group_fold: int = 1

    @nn.compact
    def __call__(self, x, train: bool, return_coefficients: bool = False):
        from .layers import MaskedBatchNorm

        return MaskedBatchNorm(
            features=x.shape[-1] // self.group_fold,
            dtype=self.dtype,
            group_fold=self.group_fold,
            name="BatchNorm_0",
        )(
            x,
            None,
            use_running_average=not train,
            return_coefficients=return_coefficients,
        )


class BasicBlock(nn.Module):
    filters: int
    strides: Tuple[int, int] = (1, 1)
    dtype: Any = None
    # packed=True: x is W-packed [B, H, W/2, 2*filters] (stride 1 only);
    # conv params and BN stats keep their logical shapes/paths, so the two
    # layouts are checkpoint-interchangeable.
    packed: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        if self.packed:
            assert self.strides == (1, 1), "packed blocks are stride-1"
            residual = x
            y = PackedConv3x3(self.filters, dtype=self.dtype,
                              name="Conv_0")(x)
            y = BatchNorm(self.dtype, group_fold=2)(y, train)
            y = nn.relu(y)
            y = PackedConv3x3(self.filters, dtype=self.dtype,
                              name="Conv_1")(y)
            y = BatchNorm(self.dtype, group_fold=2)(y, train)
            return nn.relu(y + residual)
        residual = x
        if self.strides == (1, 1):
            y = Conv3x3(self.filters, dtype=self.dtype, name="Conv_0")(x)
        else:
            y = Conv(
                self.filters, (3, 3), self.strides,
                padding=[(1, 1), (1, 1)], dtype=self.dtype, name="Conv_0",
            )(x)
        y = BatchNorm(self.dtype)(y, train)
        y = nn.relu(y)
        y = Conv3x3(self.filters, dtype=self.dtype, name="Conv_1")(y)
        y = BatchNorm(self.dtype)(y, train)
        if residual.shape != y.shape:
            residual = Conv(
                self.filters, (1, 1), self.strides, dtype=self.dtype,
                name="Conv_2",
            )(x)
            residual = BatchNorm(self.dtype)(residual, train)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    filters: int
    strides: Tuple[int, int] = (1, 1)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = Conv(self.filters, (1, 1), dtype=self.dtype)(x)
        y = BatchNorm(self.dtype)(y, train)
        y = nn.relu(y)
        y = Conv(
            self.filters, (3, 3), self.strides, padding=[(1, 1), (1, 1)],
            dtype=self.dtype,
        )(y)
        y = BatchNorm(self.dtype)(y, train)
        y = nn.relu(y)
        y = Conv(self.filters * 4, (1, 1), dtype=self.dtype)(y)
        y = BatchNorm(self.dtype)(y, train)
        if residual.shape != y.shape:
            residual = Conv(
                self.filters * 4, (1, 1), self.strides, dtype=self.dtype
            )(x)
            residual = BatchNorm(self.dtype)(residual, train)
        return nn.relu(y + residual)


class ResNetBackbone(nn.Module):
    """ResNet feature extractor, truncatable after any stage.

    stage_sizes: blocks per stage (e.g. (2, 2, 2, 2) for ResNet-18).
    n_stages: how many stages to keep. 1 == the reference's truncated stem
      (stride 4); 4 == the full backbone (stride 32).
    """

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    block_cls: Callable = BasicBlock
    n_stages: int = 1
    dtype: Any = None

    @property
    def output_stride(self) -> int:
        return 4 * (2 ** (self.n_stages - 1))

    @property
    def output_channels(self) -> int:
        mult = 4 if self.block_cls is Bottleneck else 1
        return 64 * (2 ** (self.n_stages - 1)) * mult

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Stem: 7x7/2 conv, bn, relu, 3x3/2 maxpool (models.py:49-51 keeps
        # exactly conv1, bn1, relu, maxpool from torchvision's children()).
        # Fast path: the conv's s2d(2) output feeds BN (grouped stats ==
        # BatchNorm2d over the H/2 map exactly), ReLU, and the slice-max
        # pool without ever materializing the H/2 x W/2 layout.
        fused = x.shape[-1] == 48 or (
            x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0
        )
        if fused:
            ys = StemConv(
                64, dtype=self.dtype, s2d_output=True, name="Conv_0"
            )(x)  # [B, U, V, 4*64]
            from ..ops.bn_pool import (
                bn_relu_pool_s2d,
                bn_relu_pool_supported,
                use_fused_pool,
            )

            # BN statistics fold the four s2d(2) parity groups directly on
            # the 256-channel map (group_fold=4) — identical math to
            # BatchNorm2d over the H/2 layout, but every reduction pass
            # runs on full 128-lane tiles instead of the 64->128-padded
            # grouped view (2x less HBM traffic for stats fwd+bwd).
            if use_fused_pool() and bn_relu_pool_supported(ys.shape):
                # One Pallas pass for normalize+relu+pool (ops/bn_pool.py);
                # stats/running updates stay in the BN module (cheap, fuse
                # into the conv). Same values as the unfused path below.
                scale_eff, shift_eff = BatchNorm(self.dtype, group_fold=4)(
                    ys, train, return_coefficients=True
                )
                x = bn_relu_pool_s2d(ys, scale_eff, shift_eff)
            else:
                normed = BatchNorm(self.dtype, group_fold=4)(ys, train)
                x = stem_pool_s2d(nn.relu(normed))
        else:
            x = StemConv(64, dtype=self.dtype, name="Conv_0")(x)
            x = BatchNorm(self.dtype)(x, train)
            x = nn.relu(x)
            x = nn.max_pool(
                x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
            )
        # train is a static (Python bool) argument: arg 0 is the module
        # instance under flax's lifted transform, so train sits at index 2.
        remat = use_remat()
        block_cls = (
            nn.remat(self.block_cls, static_argnums=(2,))
            if remat
            else self.block_cls
        )
        block_idx = 0
        for stage in range(self.n_stages):
            filters = 64 * (2**stage)
            # The 64-channel stage runs W-packed ([B, H, W/2, 128]: exact
            # lane tiles — see ops/conv_packed); deeper stages have C >=
            # 128 and gain nothing. Param/stat trees are identical either
            # way, so checkpoints are layout-interchangeable.
            pack = (
                stage == 0
                and self.block_cls is BasicBlock
                and use_packed_w()
                and x.shape[2] % 2 == 0
            )
            if pack:
                from ..ops.conv_packed import pack_w, unpack_w

                x = pack_w(x)
            for block in range(self.stage_sizes[stage]):
                strides = (2, 2) if stage > 0 and block == 0 else (1, 1)
                kwargs = {"packed": True} if pack else {}
                if remat:
                    # nn.remat's lifted class would auto-name differently;
                    # pass the name flax would have chosen so param/stat
                    # tree paths (and torch_port keys, torch_port.py:72/148)
                    # are identical either way.
                    kwargs["name"] = f"{self.block_cls.__name__}_{block_idx}"
                x = block_cls(
                    filters, strides=strides, dtype=self.dtype, **kwargs
                )(x, train)
                block_idx += 1
            if pack:
                x = unpack_w(x)
        return x


def make_backbone(name: str, dtype=None) -> ResNetBackbone:
    """Backbone registry. ``resnet18_stem`` is the reference architecture."""
    table = {
        "resnet18_stem": dict(
            stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock, n_stages=1
        ),
        "resnet18": dict(
            stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock, n_stages=4
        ),
        "resnet34_stem": dict(
            stage_sizes=(3, 4, 6, 3), block_cls=BasicBlock, n_stages=1
        ),
        "resnet50_stem": dict(
            stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck, n_stages=1
        ),
        "resnet50": dict(
            stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck, n_stages=4
        ),
    }
    if name not in table:
        raise ValueError(f"unknown backbone {name!r}; options: {list(table)}")
    return ResNetBackbone(dtype=dtype, **table[name])
