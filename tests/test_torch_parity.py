"""Golden end-to-end parity: a torch model with the reference's exact module
names (models.py:48-90) is randomly initialized, its state_dict is ported via
``utils/torch_port.py``, and our Flax CoVA must reproduce its eval-mode
logits on the same inputs — covering the conv stem, RoIPool, bbox encoder,
GAT, decoder, and BN-eval semantics in one shot.
"""

import jax
import os
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from cova_tpu.config import Config
from cova_tpu.models.cova import build_model
from cova_tpu.utils.torch_port import port_cova_state_dict


class Block(nn.Module):
    """BasicBlock with torchvision attribute names (conv1/bn1/conv2/bn2)."""

    def __init__(self, ch=64):
        super().__init__()
        self.conv1 = nn.Conv2d(ch, ch, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(ch)
        self.conv2 = nn.Conv2d(ch, ch, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(ch)

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(x + y)


class RefCoVA(nn.Module):
    """Reference-shaped CoVA oracle (same state_dict key namespace)."""

    def __init__(self, hidden=32, bbox_hidden=8, n_classes=4,
                 n_additional_feat=0):
        super().__init__()
        self.convnet = nn.Sequential(
            nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False),
            nn.BatchNorm2d(64),
            nn.ReLU(),
            nn.MaxPool2d(3, stride=2, padding=1),
            nn.Sequential(Block(), Block()),
        )
        self.bbox_feat_encoder = nn.Sequential(
            nn.Linear(5, bbox_hidden), nn.BatchNorm1d(bbox_hidden), nn.ReLU()
        )
        if n_additional_feat > 0:  # CoVA++ (reference models.py:72-75)
            self.bn_additional_feat = nn.BatchNorm1d(n_additional_feat)
        n_feat = 64 * 9 + bbox_hidden + n_additional_feat

        class GAT(nn.Module):
            def __init__(self):
                super().__init__()
                self.W_i = nn.Linear(n_feat, hidden, bias=False)
                self.W_j = nn.Linear(n_feat, hidden, bias=False)
                self.attention_layer = nn.Linear(2 * hidden, 1)

            def forward(self, h, ctx):
                n, k = ctx.shape
                h_pad = torch.cat([h, torch.zeros(1, h.shape[1])], 0)
                h_j = h_pad[ctx.reshape(-1)].reshape(n, k, -1)
                wh_i = self.W_i(h)
                wh_j = self.W_j(h_j)
                e = self.attention_layer(
                    torch.cat(
                        [wh_i.unsqueeze(1).expand(-1, k, -1), wh_j], 2
                    )
                ).squeeze(2)
                e = F.leaky_relu(e, 0.2)
                e = torch.where(ctx >= 0, e, torch.full_like(e, -9e15))
                a = torch.softmax(e, 1)
                return (a.unsqueeze(-1) * wh_j).sum(1)

        self.gat = GAT()
        n_total = n_feat + hidden
        self.decoder = nn.Sequential(
            nn.Dropout(0.2),
            nn.Linear(n_total, n_total),
            nn.BatchNorm1d(n_total),
            nn.ReLU(),
            nn.Dropout(0.2),
            nn.Linear(n_total, n_classes),
        )

    def roi_pool(self, fm_img, boxes, scale):
        outs = []
        for b in boxes:
            x1, y1, x2, y2 = [
                int(np.floor(float(v) * scale + 0.5)) for v in b
            ]
            x2 = max(x2 + 1, x1 + 1)
            y2 = max(y2 + 1, y1 + 1)
            crop = fm_img[:, y1:y2, x1:x2]
            outs.append(F.adaptive_max_pool2d(crop, (3, 3)))
        return torch.stack(outs).flatten(1)

    def forward(self, images, boxes_list, ctx):
        fm = self.convnet(images)
        scale = fm.shape[-1] / images.shape[-1]
        vis = torch.cat(
            [self.roi_pool(fm[i], boxes_list[i], scale)
             for i in range(len(boxes_list))]
        )
        flat = torch.cat(boxes_list)
        wh = flat[:, 2:] - flat[:, :2]
        bbox5 = torch.cat([flat[:, :2], wh, wh[:, :1] / wh[:, 1:2]], 1)
        h = torch.cat([vis, self.bbox_feat_encoder(bbox5)], 1)
        ctx_repr = self.gat(h, ctx)
        return self.decoder(torch.cat([h, ctx_repr], 1))


@pytest.fixture(scope="module")
def parity_case():
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    B, n_boxes, img = 2, 6, 64
    K = 6  # 2 * context_size with context_size=3
    ref = RefCoVA()
    ref.eval()

    images = rng.random((B, img, img, 3), dtype=np.float32)
    # In-range boxes (off-image boxes hit known clamp differences between
    # the oracle's crop and torchvision clip-after semantics).
    x1 = rng.uniform(2, img - 20, (B, n_boxes))
    y1 = rng.uniform(2, img - 20, (B, n_boxes))
    x2 = x1 + rng.uniform(6, 18, (B, n_boxes))
    y2 = y1 + rng.uniform(6, 18, (B, n_boxes))
    boxes = np.stack([x1, y1, x2, y2], -1).astype(np.float32)

    from cova_tpu.data.records import build_context_indices

    ctx_per_img = build_context_indices(n_boxes, 3)  # [n, 6]
    return ref, images, boxes, ctx_per_img, B, n_boxes, K


def test_ported_logits_match(parity_case):
    ref, images, boxes, ctx_per_img, B, n_boxes, K = parity_case

    # --- torch forward (flat ragged layout, ctx offset per image) ---
    t_images = torch.from_numpy(images.transpose(0, 3, 1, 2)).contiguous()
    t_boxes = [torch.from_numpy(boxes[i]) for i in range(B)]
    flat_ctx = []
    for i in range(B):
        c = ctx_per_img.copy()
        c[c >= 0] += i * n_boxes
        flat_ctx.append(c)
    t_ctx = torch.from_numpy(np.concatenate(flat_ctx)).long()
    with torch.no_grad():
        want = ref(t_images, t_boxes, t_ctx).numpy()  # [B*n, 4]

    # --- port weights and run our model on the padded layout ---
    params, stats = port_cova_state_dict(
        ref.state_dict(), use_context=True, bbox_hidden_dim=8
    )
    cfg = Config(
        img_height=64, max_boxes=8, context_size=3, hidden_dim=32,
        bbox_hidden_dim=8, compute_dtype="float32",
    )
    model = build_model(cfg)
    P = cfg.pad_boxes
    pad_boxes_arr = np.zeros((B, P, 4), np.float32)
    pad_boxes_arr[:, :n_boxes] = boxes
    mask = np.zeros((B, P), bool)
    mask[:, :n_boxes] = True
    ctx = np.full((B, P, K), -1, np.int32)
    ctx[:, :n_boxes] = ctx_per_img
    images_u8 = None

    # Our model consumes uint8 and normalizes by /255; feed the same values
    # by pre-scaling the float images into the uint8 domain exactly.
    images_255 = (images * 255.0).astype(np.float32)
    # Use apply with a float image pathway: emulate by passing uint8 only if
    # lossless. Instead, bypass: scale to [0,1] happens inside; feed
    # quantized images to BOTH sides for exactness.
    images_q = np.round(images_255).astype(np.uint8)
    t_images_q = torch.from_numpy(
        (images_q.astype(np.float32) / 255.0).transpose(0, 3, 1, 2)
    ).contiguous()
    with torch.no_grad():
        want = ref(t_images_q, t_boxes, t_ctx).numpy()

    variables = {"params": params, "batch_stats": stats}
    out = model.apply(
        variables, images_q, pad_boxes_arr, mask, ctx, train=False
    )
    got = np.asarray(out.logits)  # [B, P, 4]
    got_flat = np.concatenate([got[i, :n_boxes] for i in range(B)])

    np.testing.assert_allclose(got_flat, want, rtol=2e-3, atol=2e-4)


def test_ported_attention_matches(parity_case):
    ref, images, boxes, ctx_per_img, B, n_boxes, K = parity_case
    params, stats = port_cova_state_dict(
        ref.state_dict(), use_context=True, bbox_hidden_dim=8
    )
    cfg = Config(
        img_height=64, max_boxes=8, context_size=3, hidden_dim=32,
        bbox_hidden_dim=8, compute_dtype="float32",
    )
    model = build_model(cfg)
    P = cfg.pad_boxes
    images_q = np.round(images * 255.0).astype(np.uint8)
    pad_boxes_arr = np.zeros((B, P, 4), np.float32)
    pad_boxes_arr[:, :n_boxes] = boxes
    mask = np.zeros((B, P), bool)
    mask[:, :n_boxes] = True
    ctx = np.full((B, P, K), -1, np.int32)
    ctx[:, :n_boxes] = ctx_per_img
    out = model.apply(
        {"params": params, "batch_stats": stats},
        images_q, pad_boxes_arr, mask, ctx, train=False,
    )
    attn = np.asarray(out.attn_wts)
    # attention rows over valid context sum to 1
    assert attn.shape == (B, P, K)
    sums = attn[:, :n_boxes].sum(-1)
    np.testing.assert_allclose(sums, 1.0, rtol=1e-5)


def test_cli_serves_reference_checkpoint(tmp_path):
    """`cova predict --torch_model ref.pth` serves a reference-format
    checkpoint (model.state_dict(), reference train.py:84) with NO orbax
    checkpoint present — the ported-serving path end-to-end through the
    CLI."""
    from cova_tpu.cli import main

    torch.manual_seed(0)
    ref = RefCoVA(hidden=32, bbox_hidden=8).eval()
    pth = str(tmp_path / "saved_model.pth")
    torch.save(ref.state_dict(), pth)
    out = str(tmp_path / "preds")
    rc = main([
        "predict", "--synthetic", "12", "--img_height", "64",
        "-bs", "4", "-cs", "3", "-hd", "32", "-bbhd", "8",
        "--compute_dtype", "float32", "-nw", "2",
        "--output_dir", str(tmp_path / "results"),
        "--torch_model", pth, "--out_dir", out, "--max_pages", "2",
    ])
    assert rc == 0
    csvs = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert "retrieval.csv" in csvs and len(csvs) == 3
    rows = np.atleast_2d(np.loadtxt(
        os.path.join(out, sorted(csvs)[0]), delimiter=",", skiprows=1
    ))
    probs = rows[:, 5:]
    np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-3)
