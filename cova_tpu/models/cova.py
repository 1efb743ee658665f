"""The CoVA model: Representation Network + GAT context + FC decoder.

Capability-parity rebuild of the reference ``CoVA``
(``/root/reference/models.py:9-148``) as a single Flax module over **padded**
batches:

  * truncated ResNet-18 visual backbone (stride 4, 64ch) -> RoIPool(3x3)
    -> 576-dim visual feature per box (``models.py:48-62,124-127``);
  * bbox positional feature [x, y, w, h, aspect] -> Linear(32) -> BatchNorm
    -> ReLU (``models.py:65-70,129-148``), with masked BN statistics;
  * optional additional features, BatchNorm'd (``models.py:72-75,109``);
  * single GAT layer over the preorder K-neighborhood (``models.py:151-212``);
  * decoder Dropout -> Linear -> BN -> ReLU -> Dropout -> Linear
    (``models.py:82-90``).

Differences by design (TPU): NHWC uint8 images normalized on-chip; every
tensor is [B, P, ...] with a validity mask instead of the reference's ragged
flat [N_total, ...]; ``spatial_scale`` is the exact fm_H/img_H ratio (0.25
at every product geometry), computed statically from traced shapes instead
of the reference's dummy forward (``models.py:53-56``). Attention weights
are always returned (cheap — they are an intermediate), serving
``extract_attn_wts``.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax.numpy as jnp
from flax import linen as nn

import jax

from ..ops.roi_pool import roi_pool
from ..ops.roi_pool_pallas import roi_pool_pallas
from .gat import GraphAttention
from .layers import MaskedBatchNorm, TorchLinear
from .resnet import make_backbone


class CoVAOutput(NamedTuple):
    logits: jnp.ndarray  # [B, P, n_classes] float32
    attn_wts: Optional[jnp.ndarray]  # [B, P, K] float32 or None


class CoVA(nn.Module):
    n_classes: int = 4
    use_context: bool = True
    hidden_dim: int = 384
    bbox_hidden_dim: int = 32
    n_additional_feat: int = 0
    drop_prob: float = 0.2
    roi_output_size: int = 3
    backbone: str = "resnet18_stem"
    roi_impl: str = "auto"  # auto | pallas | xla
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    def setup(self):
        self.convnet = make_backbone(self.backbone, dtype=self.compute_dtype)
        if self.use_context:
            self.gat = GraphAttention(
                hidden_dim=self.hidden_dim,
                dtype=self.compute_dtype,
                param_dtype=self.param_dtype,
            )
        if self.bbox_hidden_dim > 0:
            self.bbox_linear = TorchLinear(
                self.bbox_hidden_dim,
                dtype=self.compute_dtype,
                param_dtype=self.param_dtype,
            )
            self.bbox_bn = MaskedBatchNorm(
                self.bbox_hidden_dim, dtype=self.compute_dtype
            )
        if self.n_additional_feat > 0:
            self.additional_bn = MaskedBatchNorm(
                self.n_additional_feat, dtype=self.compute_dtype
            )
        self.dropout = nn.Dropout(self.drop_prob)
        n_visual = self.convnet.output_channels * self.roi_output_size**2
        n_feat = n_visual + max(self.bbox_hidden_dim, 0) + self.n_additional_feat
        n_total = n_feat + (self.hidden_dim if self.use_context else 0)
        self.decoder_hidden = TorchLinear(
            n_total,
            dtype=self.compute_dtype,
            param_dtype=self.param_dtype,
        )
        self.decoder_bn = MaskedBatchNorm(n_total, dtype=self.compute_dtype)
        self.decoder_out = TorchLinear(
            self.n_classes,
            dtype=self.compute_dtype,
            param_dtype=self.param_dtype,
        )

    def visual_features(self, images_u8, boxes, box_mask, train: bool):
        """images_u8: [B, H, W, 3] uint8 or its host-side s2d(4) form
        [B, H/4, W/4, 48] (``data.batching.collate`` ships the latter — the
        3-channel layout is lane-pad-hostile on TPU); boxes: [B, P, 4].
        -> [B, P, V]."""
        # Channel count doubles as the layout flag: 3 = raw RGB, 48 = the
        # host-side s2d(4) form (16*3). Nothing else is a valid input; a
        # genuinely 48-channel raw tensor would be silently misrouted, so
        # reject anything unexpected loudly here (and in models.resnet
        # StemConv, which applies the same convention).
        assert images_u8.shape[-1] in (3, 48), (
            f"expected RGB [B,H,W,3] or s2d(4) [B,H/4,W/4,48] input, got "
            f"channels={images_u8.shape[-1]}"
        )
        x = images_u8.astype(self.compute_dtype) / 255.0  # ToTensor parity
        fm = self.convnet(x, train=train)  # [B, H/4, W/4, C]
        img_h = images_u8.shape[1] * (4 if images_u8.shape[-1] == 48 else 1)
        # Exact ratio, matching the reference's dummy-forward measurement
        # (models.py:52-56: spatial_scale = conv_H / img_H). The earlier
        # 1/(img_h // fm_h) floor-division silently diverged whenever
        # img_h wasn't an exact multiple of fm_h (e.g. raw RGB H=18 ->
        # 1/3 instead of 5/18); identical (0.25) at all product geometries.
        spatial_scale = fm.shape[1] / img_h
        impl = self.roi_impl
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        if impl == "pallas":
            pooled = roi_pool_pallas(
                fm,
                boxes.astype(jnp.float32),
                box_mask,
                spatial_scale,
                self.roi_output_size,
                self.roi_output_size,
            )
        else:
            pooled = roi_pool(
                fm,
                boxes.astype(jnp.float32),
                spatial_scale=spatial_scale,
                out_h=self.roi_output_size,
                out_w=self.roi_output_size,
            )  # [B, P, r, r, C]
        b, p = pooled.shape[:2]
        return pooled.reshape(b, p, -1)

    def bbox_features(self, boxes, box_mask, train: bool):
        """[x, y, w, h, aspect] -> Linear -> maskedBN -> ReLU
        (``models.py:129-148``). Padded rows are zeroed (w = h = 0 would
        yield NaN aspect ratios; the reference never sees padding)."""
        if self.bbox_hidden_dim <= 0:
            b, p = boxes.shape[:2]
            return jnp.zeros((b, p, 0), self.compute_dtype)
        x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
        w = x2 - x1
        h = y2 - y1
        aspect = jnp.where(h > 0, w / jnp.where(h > 0, h, 1.0), 0.0)
        feats = jnp.concatenate([x1, y1, w, h, aspect], axis=-1)
        feats = jnp.where(box_mask[..., None], feats, 0.0)
        z = self.bbox_linear(feats.astype(self.compute_dtype))
        z = self.bbox_bn(z, box_mask, use_running_average=not train)
        return nn.relu(z)

    def __call__(
        self,
        images_u8: jnp.ndarray,  # [B, H, W, 3] uint8
        boxes: jnp.ndarray,  # [B, P, 4] float32 x1y1x2y2
        box_mask: jnp.ndarray,  # [B, P] bool
        context_indices: jnp.ndarray,  # [B, P, K] int32, -1 = pad
        additional_feats: Optional[jnp.ndarray] = None,  # [B, P, F]
        train: bool = False,
    ) -> CoVAOutput:
        parts = [
            self.visual_features(images_u8, boxes, box_mask, train),
            self.bbox_features(boxes, box_mask, train),
        ]
        if self.n_additional_feat > 0:
            af = self.additional_bn(
                additional_feats.astype(self.compute_dtype),
                box_mask,
                use_running_average=not train,
            )
            parts.append(af)
        own = jnp.concatenate(parts, axis=-1)  # [B, P, n_feat]

        attn = None
        if self.use_context:
            ctx_repr, attn = self.gat(own, context_indices)
            combined = jnp.concatenate([own, ctx_repr], axis=-1)
        else:
            combined = own

        # Decoder (models.py:82-90). Dropout hits all rows as in the
        # reference; padded rows are masked downstream.
        y = self.dropout(combined, deterministic=not train)
        y = self.decoder_hidden(y)
        y = self.decoder_bn(y, box_mask, use_running_average=not train)
        y = nn.relu(y)
        y = self.dropout(y, deterministic=not train)
        logits = self.decoder_out(y)
        return CoVAOutput(
            logits=logits.astype(jnp.float32),
            attn_wts=None if attn is None else attn.astype(jnp.float32),
        )


def build_model(cfg) -> CoVA:
    """Construct the flagship model from a ``Config``."""
    return CoVA(
        n_classes=cfg.n_classes,
        use_context=cfg.use_context,
        hidden_dim=cfg.gat_hidden_dim,
        bbox_hidden_dim=cfg.bbox_hidden_dim,
        n_additional_feat=(
            cfg.n_additional_feat if cfg.use_additional_feat else 0
        ),
        drop_prob=cfg.drop_prob,
        roi_output_size=cfg.roi,
        backbone=cfg.backbone,
        compute_dtype=jnp.dtype(cfg.compute_dtype),
        param_dtype=jnp.dtype(cfg.param_dtype),
    )
