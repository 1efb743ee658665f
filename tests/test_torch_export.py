"""Reverse port: export our trained Flax CoVA to the reference's torch
``state_dict`` format (``utils.torch_port.export_cova_state_dict`` + the
``cova export`` CLI), so models trained here drop into the reference repo's
own eval/visualize scripts (reference ``evaluate.py:184-198``). Tested as
the exact inverse of the forward port and by strict-loading into a
reference-shaped torch model and matching logits."""

import os

import jax
import numpy as np
import torch

from cova_tpu.config import Config
from cova_tpu.models.cova import build_model
from cova_tpu.utils.torch_port import (
    export_cova_state_dict,
    port_cova_state_dict,
)

from test_torch_parity import RefCoVA


import pytest


@pytest.mark.parametrize("n_af", [0, 4])  # base CoVA and CoVA++
def test_export_inverts_port(n_af):
    """torch -> port -> export reproduces every reference tensor bitwise
    (f32), including the strict-load-required num_batches_tracked keys."""
    torch.manual_seed(1)
    ref = RefCoVA(hidden=32, bbox_hidden=8, n_additional_feat=n_af)
    sd0 = ref.state_dict()
    params, stats = port_cova_state_dict(
        sd0, use_context=True, bbox_hidden_dim=8, n_additional_feat=n_af
    )
    sd1 = export_cova_state_dict(
        params, stats, use_context=True, bbox_hidden_dim=8,
        n_additional_feat=n_af,
    )
    assert set(sd1.keys()) == set(sd0.keys())
    for k in sd0:
        a, b = sd0[k].numpy(), sd1[k].numpy()
        assert a.shape == b.shape, k
        if "num_batches_tracked" in k:
            continue  # export writes 0 (the reference never consults it)
        np.testing.assert_array_equal(a, b, err_msg=k)


def test_exported_model_strict_loads_and_matches_logits():
    """Our randomly-initialized Flax CoVA, exported, must strict-load into
    the reference-shaped torch model and reproduce our eval-mode logits —
    the reverse direction of test_ported_logits_match."""
    rng = np.random.default_rng(3)
    B, n_boxes, img = 2, 6, 64
    cfg = Config(
        img_height=img, max_boxes=8, context_size=3, hidden_dim=32,
        bbox_hidden_dim=8, compute_dtype="float32",
    )
    model = build_model(cfg)
    P, K = cfg.pad_boxes, 2 * cfg.context_size

    from cova_tpu.data.records import build_context_indices

    images_q = rng.integers(0, 256, (B, img, img, 3), dtype=np.uint8)
    x1 = rng.uniform(2, img - 20, (B, n_boxes))
    y1 = rng.uniform(2, img - 20, (B, n_boxes))
    boxes = np.stack(
        [x1, y1, x1 + rng.uniform(6, 18, (B, n_boxes)),
         y1 + rng.uniform(6, 18, (B, n_boxes))], -1
    ).astype(np.float32)
    ctx_per_img = build_context_indices(n_boxes, 3)

    pad_boxes_arr = np.zeros((B, P, 4), np.float32)
    pad_boxes_arr[:, :n_boxes] = boxes
    mask = np.zeros((B, P), bool)
    mask[:, :n_boxes] = True
    ctx = np.full((B, P, K), -1, np.int32)
    ctx[:, :n_boxes] = ctx_per_img

    variables = model.init(
        jax.random.PRNGKey(7), images_q, pad_boxes_arr, mask, ctx,
        train=False,
    )
    out = model.apply(variables, images_q, pad_boxes_arr, mask, ctx,
                      train=False)
    ours = np.concatenate(
        [np.asarray(out.logits)[i, :n_boxes] for i in range(B)]
    )

    sd = export_cova_state_dict(
        jax.device_get(variables["params"]),
        jax.device_get(variables.get("batch_stats", {})),
        use_context=True, bbox_hidden_dim=8,
    )
    ref = RefCoVA(hidden=32, bbox_hidden=8)
    ref.load_state_dict(sd, strict=True)  # every key, exact shapes
    ref.eval()

    t_images = torch.from_numpy(
        (images_q.astype(np.float32) / 255.0).transpose(0, 3, 1, 2)
    ).contiguous()
    t_boxes = [torch.from_numpy(boxes[i]) for i in range(B)]
    flat_ctx = []
    for i in range(B):
        c = ctx_per_img.copy()
        c[c >= 0] += i * n_boxes
        flat_ctx.append(c)
    with torch.no_grad():
        want = ref(
            t_images, t_boxes,
            torch.from_numpy(np.concatenate(flat_ctx)).long(),
        ).numpy()
    np.testing.assert_allclose(ours, want, rtol=2e-3, atol=2e-4)


def test_flax_init_with_additional_feats_exports_strict():
    """A CoVA++ model initialized HERE (additional_bn tree) exports to a
    state_dict that strict-loads into the reference-shaped torch model with
    bn_additional_feat — the tree-naming direction the torch->flax->torch
    inversion test cannot cover."""
    cfg = Config(
        img_height=64, max_boxes=8, context_size=3, hidden_dim=32,
        bbox_hidden_dim=8, compute_dtype="float32",
        use_additional_feat=True, n_additional_feat=4,
    )
    model = build_model(cfg)
    P, K = cfg.pad_boxes, 2 * cfg.context_size
    rng = np.random.default_rng(5)
    images = rng.integers(0, 256, (1, 64, 64, 3), dtype=np.uint8)
    boxes = np.tile(np.array([2.0, 2.0, 12.0, 12.0], np.float32),
                    (1, P, 1))
    mask = np.ones((1, P), bool)
    ctx = np.full((1, P, K), -1, np.int32)
    feats = rng.normal(size=(1, P, 4)).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(2), images, boxes, mask, ctx, feats, train=False
    )
    sd = export_cova_state_dict(
        jax.device_get(variables["params"]),
        jax.device_get(variables["batch_stats"]),
        use_context=True, bbox_hidden_dim=8, n_additional_feat=4,
    )
    ref = RefCoVA(hidden=32, bbox_hidden=8, n_additional_feat=4)
    ref.load_state_dict(sd, strict=True)


def test_cli_export_roundtrip(tmp_path):
    """`cova train` then `cova export`: the .pth lands at the reference's
    lookup path, strict-loads into the reference-shaped model, and serving
    it back through `--torch_model` reproduces the orbax checkpoint's
    predictions (full circle through both port directions)."""
    from cova_tpu.cli import main

    flags = [
        "--synthetic", "12", "--img_height", "64", "-bs", "4", "-cs", "3",
        "-hd", "32", "-bbhd", "8", "--compute_dtype", "float32", "-nw", "2",
        "--output_dir", str(tmp_path),
    ]
    assert main(["train", "-e", "1"] + flags) == 0
    assert main(["export"] + flags) == 0

    results = [d for d in os.listdir(tmp_path) if d.startswith("lr-")]
    assert len(results) == 1
    pth = os.path.join(tmp_path, results[0], "Fold-1 saved_model.pth")
    assert os.path.exists(pth)
    ref = RefCoVA(hidden=32, bbox_hidden=8)
    ref.load_state_dict(torch.load(pth, map_location="cpu"), strict=True)

    out_a = str(tmp_path / "preds_orbax")
    out_b = str(tmp_path / "preds_torch")
    assert main(["predict", "--max_pages", "2", "--out_dir", out_a]
                + flags) == 0
    assert main(["predict", "--max_pages", "2", "--out_dir", out_b,
                 "--torch_model", pth] + flags) == 0
    for f in sorted(os.listdir(out_a)):
        if f == "retrieval.csv":  # has class-name strings; picks must agree
            with open(os.path.join(out_a, f)) as fa, \
                    open(os.path.join(out_b, f)) as fb:
                assert fa.read() == fb.read()
            continue
        a = np.loadtxt(os.path.join(out_a, f), delimiter=",", skiprows=1,
                       ndmin=2)
        b = np.loadtxt(os.path.join(out_b, f), delimiter=",", skiprows=1,
                       ndmin=2)
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4, err_msg=f)
