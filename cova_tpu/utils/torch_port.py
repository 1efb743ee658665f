"""Port PyTorch state dicts (torchvision ResNet / reference CoVA checkpoints)
into this framework's Flax parameter trees.

Two use cases:
  * ``port_resnet18_stem``: load ImageNet-pretrained torchvision ResNet-18
    weights into the truncated backbone — the reference initializes from
    ``resnet18(pretrained=True)`` (``/root/reference/models.py:49-51``); this
    environment has no network egress, so porting happens from a
    ``state_dict`` file when the user supplies one.
  * ``port_cova_state_dict``: convert a full trained reference checkpoint
    (``torch.save(model.state_dict())``, ``train.py:84``) so reference
    models can be *served* from this framework without retraining.

Layout conversions: torch conv [O, I, kh, kw] -> flax [kh, kw, I, O]; torch
linear [O, I] -> flax [I, O]; BatchNorm weight/bias/running_mean/running_var
-> scale/bias + batch_stats mean/var.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _t(x) -> np.ndarray:
    """torch tensor / array -> float32 numpy (no torch import required)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _conv(sd, key) -> np.ndarray:
    return _t(sd[key]).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _linear(sd, key) -> np.ndarray:
    return _t(sd[key]).T  # [O, I] -> [I, O]


def _bn(sd, prefix) -> Tuple[Dict, Dict]:
    params = {"scale": _t(sd[f"{prefix}.weight"]),
              "bias": _t(sd[f"{prefix}.bias"])}
    stats = {"mean": _t(sd[f"{prefix}.running_mean"]),
             "var": _t(sd[f"{prefix}.running_var"])}
    return params, stats


def _backbone_trees(
    sd: Mapping[str, Any], conv1: str, bn1: str, layer1: str
) -> Tuple[Dict, Dict]:
    """Build (params, batch_stats) for the truncated stem given torch key
    prefixes. torchvision uses conv1/bn1/layer1.{0,1}; the reference's
    ``nn.Sequential(children()[:-5])`` renames them convnet.0/1/4.{0,1}."""
    params: Dict[str, Any] = {"Conv_0": {"kernel": _conv(sd, f"{conv1}.weight")}}
    stats: Dict[str, Any] = {}
    p, s = _bn(sd, bn1)
    params["BatchNorm_0"] = {"BatchNorm_0": p}
    stats["BatchNorm_0"] = {"BatchNorm_0": s}
    for blk in (0, 1):
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        for ci, (cname, bname) in enumerate(
            [("conv1", "bn1"), ("conv2", "bn2")]
        ):
            bp[f"Conv_{ci}"] = {
                "kernel": _conv(sd, f"{layer1}.{blk}.{cname}.weight")
            }
            p, s = _bn(sd, f"{layer1}.{blk}.{bname}")
            bp[f"BatchNorm_{ci}"] = {"BatchNorm_0": p}
            bs[f"BatchNorm_{ci}"] = {"BatchNorm_0": s}
        params[f"BasicBlock_{blk}"] = bp
        stats[f"BasicBlock_{blk}"] = bs
    return params, stats


def port_resnet18_stem(state_dict: Mapping[str, Any]) -> Tuple[Dict, Dict]:
    """torchvision resnet18 state_dict -> (backbone params, batch_stats)."""
    return _backbone_trees(state_dict, "conv1", "bn1", "layer1")


def _port_basic_block(sd: Mapping[str, Any], tp: str) -> Tuple[Dict, Dict]:
    """torchvision BasicBlock at key prefix ``tp`` -> (params, stats) with
    our auto-naming (Conv_0/1 + BatchNorm_0/1, downsample Conv_2 +
    BatchNorm_2)."""
    bp: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    for ci, (cname, bname) in enumerate([("conv1", "bn1"), ("conv2", "bn2")]):
        bp[f"Conv_{ci}"] = {"kernel": _conv(sd, f"{tp}.{cname}.weight")}
        p, s = _bn(sd, f"{tp}.{bname}")
        bp[f"BatchNorm_{ci}"] = {"BatchNorm_0": p}
        bs[f"BatchNorm_{ci}"] = {"BatchNorm_0": s}
    if f"{tp}.downsample.0.weight" in sd:
        bp["Conv_2"] = {"kernel": _conv(sd, f"{tp}.downsample.0.weight")}
        p, s = _bn(sd, f"{tp}.downsample.1")
        bp["BatchNorm_2"] = {"BatchNorm_0": p}
        bs["BatchNorm_2"] = {"BatchNorm_0": s}
    return bp, bs


def _port_bottleneck(sd: Mapping[str, Any], tp: str) -> Tuple[Dict, Dict]:
    """torchvision Bottleneck -> our Bottleneck (Conv_0/1/2 + BatchNorm_0/1/2,
    downsample Conv_3 + BatchNorm_3)."""
    bp: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    for ci, (cname, bname) in enumerate(
        [("conv1", "bn1"), ("conv2", "bn2"), ("conv3", "bn3")]
    ):
        bp[f"Conv_{ci}"] = {"kernel": _conv(sd, f"{tp}.{cname}.weight")}
        p, s = _bn(sd, f"{tp}.{bname}")
        bp[f"BatchNorm_{ci}"] = {"BatchNorm_0": p}
        bs[f"BatchNorm_{ci}"] = {"BatchNorm_0": s}
    if f"{tp}.downsample.0.weight" in sd:
        bp["Conv_3"] = {"kernel": _conv(sd, f"{tp}.downsample.0.weight")}
        p, s = _bn(sd, f"{tp}.downsample.1")
        bp["BatchNorm_3"] = {"BatchNorm_0": p}
        bs["BatchNorm_3"] = {"BatchNorm_0": s}
    return bp, bs


def port_resnet_backbone(
    state_dict: Mapping[str, Any],
    stage_sizes=(2, 2, 2, 2),
    n_stages: int = 1,
    bottleneck: bool = False,
) -> Tuple[Dict, Dict]:
    """torchvision ResNet state_dict -> (params, batch_stats) for any
    ``models.resnet.ResNetBackbone`` truncation — the pretrained-ImageNet
    init path (the reference constructs ``resnet18(pretrained=True)``,
    ``/root/reference/models.py:49-51``).

    Handles every backbone in ``make_backbone``'s registry: the truncated
    ``*_stem`` variants (n_stages=1), the full resnet18/34 (BasicBlock with
    downsample convs on stages 2-4), and resnet50 (Bottleneck; downsample on
    every stage's first block including stage 1).
    """
    sd = state_dict
    params: Dict[str, Any] = {"Conv_0": {"kernel": _conv(sd, "conv1.weight")}}
    stats: Dict[str, Any] = {}
    p, s = _bn(sd, "bn1")
    params["BatchNorm_0"] = {"BatchNorm_0": p}
    stats["BatchNorm_0"] = {"BatchNorm_0": s}
    port_block = _port_bottleneck if bottleneck else _port_basic_block
    block_name = "Bottleneck" if bottleneck else "BasicBlock"
    bi = 0
    for stage in range(n_stages):
        for blk in range(stage_sizes[stage]):
            bp, bs = port_block(sd, f"layer{stage + 1}.{blk}")
            params[f"{block_name}_{bi}"] = bp
            stats[f"{block_name}_{bi}"] = bs
            bi += 1
    return params, stats


def port_backbone_for(backbone: str, state_dict) -> Tuple[Dict, Dict]:
    """Port a torchvision ResNet state_dict for a named ``make_backbone``
    variant (see ``models.resnet``)."""
    table = {
        "resnet18_stem": ((2, 2, 2, 2), 1, False),
        "resnet18": ((2, 2, 2, 2), 4, False),
        "resnet34_stem": ((3, 4, 6, 3), 1, False),
        "resnet50_stem": ((3, 4, 6, 3), 1, True),
        "resnet50": ((3, 4, 6, 3), 4, True),
    }
    stage_sizes, n_stages, bottleneck = table[backbone]
    return port_resnet_backbone(state_dict, stage_sizes, n_stages, bottleneck)


def _visual_row_perm(n_feat: int, roi: int = 3, channels: int = 64):
    """Row permutation for weight matrices consuming the feature vector.

    torch flattens RoI features channel-major ([C, r, r] -> c*r*r + i*r + j,
    ``/root/reference/models.py:124-127`` via ``.view``); our TPU layout is
    channel-minor ([r, r, C] -> i*r*C + j*C + c, the natural lane layout).
    Returns an index array ``perm`` with ``W_ours[row] = W_torch[perm[row]]``
    (identity outside the visual block).
    """
    n_vis = channels * roi * roi
    perm = np.arange(n_feat)
    for i in range(roi):
        for j in range(roi):
            for c in range(channels):
                perm[i * roi * channels + j * channels + c] = (
                    c * roi * roi + i * roi + j
                )
    assert (np.sort(perm[:n_vis]) == np.arange(n_vis)).all()
    return perm


def port_cova_state_dict(
    state_dict: Mapping[str, Any],
    use_context: bool = True,
    bbox_hidden_dim: int = 32,
    n_additional_feat: int = 0,
    roi: int = 3,
    backbone_channels: int = 64,
) -> Tuple[Dict, Dict]:
    """Reference CoVA state_dict -> (params, batch_stats) for our CoVA.

    Reference module names (models.py:48-90): convnet.{0,1,4}, the latter a
    Sequential of two BasicBlocks; bbox_feat_encoder.{0 Linear,1 BN};
    gat.{W_i,W_j,attention_layer}; decoder.{1 Linear,2 BN,5 Linear}.
    """
    sd = state_dict
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["convnet"], stats["convnet"] = _backbone_trees(
        sd, "convnet.0", "convnet.1", "convnet.4"
    )

    if bbox_hidden_dim > 0:
        params["bbox_linear"] = {
            "Dense_0": {
                "kernel": _linear(sd, "bbox_feat_encoder.0.weight"),
                "bias": _t(sd["bbox_feat_encoder.0.bias"]),
            }
        }
        p, s = _bn(sd, "bbox_feat_encoder.1")
        params["bbox_bn"] = p
        stats["bbox_bn"] = s

    if n_additional_feat > 0:
        p, s = _bn(sd, "bn_additional_feat")
        params["additional_bn"] = p
        stats["additional_bn"] = s

    n_vis = backbone_channels * roi * roi
    n_feat = n_vis + bbox_hidden_dim + n_additional_feat
    perm = _visual_row_perm(n_feat, roi, backbone_channels)

    if use_context:
        params["gat"] = {
            "W_i": {"kernel": _linear(sd, "gat.W_i.weight")[perm]},
            "W_j": {"kernel": _linear(sd, "gat.W_j.weight")[perm]},
            "att_w": _linear(sd, "gat.attention_layer.weight"),
            "att_b": _t(sd["gat.attention_layer.bias"]),
        }

    dec_kernel = _linear(sd, "decoder.1.weight")
    dec_perm = np.concatenate(
        [perm, np.arange(n_feat, dec_kernel.shape[0])]
    )  # visual rows permuted; bbox/additional/context rows untouched
    params["decoder_hidden"] = {
        "Dense_0": {
            "kernel": dec_kernel[dec_perm],
            "bias": _t(sd["decoder.1.bias"]),
        }
    }
    p, s = _bn(sd, "decoder.2")
    params["decoder_bn"] = p
    stats["decoder_bn"] = s
    params["decoder_out"] = {
        "Dense_0": {
            "kernel": _linear(sd, "decoder.5.weight"),
            "bias": _t(sd["decoder.5.bias"]),
        }
    }
    return params, stats


def _np(x) -> np.ndarray:
    """jax array / numpy -> float32 numpy (host fetch, no torch import)."""
    return np.asarray(x, dtype=np.float32)


def _inv_rows(kernel: np.ndarray, perm: np.ndarray) -> np.ndarray:
    """Invert a row gather: port built ``ours[r] = torch_T[perm[r]]``, so
    scatter back with ``torch_T[perm] = ours``."""
    out = np.empty_like(kernel)
    out[perm] = kernel
    return out


def export_cova_state_dict(
    params: Mapping[str, Any],
    batch_stats: Mapping[str, Any],
    use_context: bool = True,
    bbox_hidden_dim: int = 32,
    n_additional_feat: int = 0,
    roi: int = 3,
    backbone_channels: int = 64,
):
    """Our Flax CoVA trees -> a reference-format torch ``state_dict`` — the
    exact inverse of ``port_cova_state_dict``, so a model trained HERE can be
    loaded by the reference repo with ``model.load_state_dict(torch.load(p))``
    (strict: every key the reference's modules own is emitted, including BN
    ``num_batches_tracked``; reference module names per
    ``/root/reference/models.py:48-90``).

    Only the reference architecture exports: the truncated ResNet-18 stem
    (``convnet.{0,1,4}``) with ``backbone_channels`` channels. Training-side
    layout changes (W-packed layer1, s2d stem) don't matter here — the
    STORED trees are layout-neutral (see ROADMAP: checkpoint-interchangeable).

    Returns an ``OrderedDict[str, torch.Tensor]`` ready for ``torch.save``.
    """
    import collections

    import torch

    sd: "collections.OrderedDict[str, torch.Tensor]" = (
        collections.OrderedDict()
    )

    def put(key: str, arr: np.ndarray) -> None:
        # .copy(): jax host arrays are non-writable views; torch wants
        # owned writable memory.
        sd[key] = torch.from_numpy(np.ascontiguousarray(_np(arr)).copy())

    def put_conv(key: str, kernel: np.ndarray) -> None:
        put(key, _np(kernel).transpose(3, 2, 0, 1))  # HWIO -> OIHW

    def put_linear(key_prefix: str, dense: Mapping[str, Any]) -> None:
        put(f"{key_prefix}.weight", _np(dense["kernel"]).T)  # [I,O] -> [O,I]
        put(f"{key_prefix}.bias", dense["bias"])

    def put_bn(prefix: str, p: Mapping[str, Any], s: Mapping[str, Any]):
        put(f"{prefix}.weight", p["scale"])
        put(f"{prefix}.bias", p["bias"])
        put(f"{prefix}.running_mean", s["mean"])
        put(f"{prefix}.running_var", s["var"])
        # The reference never consults the count (its BNs use the default
        # running-average momentum), but strict load requires the key.
        sd[f"{prefix}.num_batches_tracked"] = torch.tensor(
            0, dtype=torch.int64
        )

    cp, cs = params["convnet"], batch_stats["convnet"]
    expect = {"Conv_0", "BatchNorm_0", "BasicBlock_0", "BasicBlock_1"}
    assert set(cp.keys()) == expect, (
        "export_cova_state_dict handles the reference's truncated "
        f"ResNet-18 stem only; got convnet tree {sorted(cp.keys())}"
    )
    put_conv("convnet.0.weight", cp["Conv_0"]["kernel"])
    put_bn("convnet.1", cp["BatchNorm_0"]["BatchNorm_0"],
           cs["BatchNorm_0"]["BatchNorm_0"])
    for blk in (0, 1):
        bp, bs = cp[f"BasicBlock_{blk}"], cs[f"BasicBlock_{blk}"]
        for ci, (cname, bname) in enumerate(
            [("conv1", "bn1"), ("conv2", "bn2")]
        ):
            put_conv(f"convnet.4.{blk}.{cname}.weight",
                     bp[f"Conv_{ci}"]["kernel"])
            put_bn(f"convnet.4.{blk}.{bname}",
                   bp[f"BatchNorm_{ci}"]["BatchNorm_0"],
                   bs[f"BatchNorm_{ci}"]["BatchNorm_0"])

    if bbox_hidden_dim > 0:
        put_linear("bbox_feat_encoder.0", params["bbox_linear"]["Dense_0"])
        put_bn("bbox_feat_encoder.1", params["bbox_bn"],
               batch_stats["bbox_bn"])

    if n_additional_feat > 0:
        put_bn("bn_additional_feat", params["additional_bn"],
               batch_stats["additional_bn"])

    n_vis = backbone_channels * roi * roi
    n_feat = n_vis + bbox_hidden_dim + n_additional_feat
    perm = _visual_row_perm(n_feat, roi, backbone_channels)

    if use_context:
        gat = params["gat"]
        put("gat.W_i.weight", _inv_rows(_np(gat["W_i"]["kernel"]), perm).T)
        put("gat.W_j.weight", _inv_rows(_np(gat["W_j"]["kernel"]), perm).T)
        put("gat.attention_layer.weight", _np(gat["att_w"]).T)
        put("gat.attention_layer.bias", gat["att_b"])

    dec = _np(params["decoder_hidden"]["Dense_0"]["kernel"])
    dec_perm = np.concatenate([perm, np.arange(n_feat, dec.shape[0])])
    put("decoder.1.weight", _inv_rows(dec, dec_perm).T)
    put("decoder.1.bias", params["decoder_hidden"]["Dense_0"]["bias"])
    put_bn("decoder.2", params["decoder_bn"], batch_stats["decoder_bn"])
    put_linear("decoder.5", params["decoder_out"]["Dense_0"])
    return sd


def load_torch_file(path: str) -> Mapping[str, Any]:
    """Load a ``.pth`` state_dict (requires torch, CPU map)."""
    import torch

    return torch.load(path, map_location="cpu")
