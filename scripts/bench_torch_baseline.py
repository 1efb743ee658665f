"""Measure the PyTorch-CPU reference baseline (webpages/sec, train step).

The reference publishes no speed numbers (SURVEY.md §6), so the >20x/chip
north-star target (BASELINE.json) needs a measured PyTorch-CPU anchor. This
is a freshly-written, architecture-equivalent torch implementation of the
reference's per-step compute (truncated ResNet-18 stem + RoIPool(3x3) + GAT
+ FC decoder, CE-sum loss, Adam) at the reference's default geometry
(1280x1280 screenshots, batch 5, ~93 boxes/page, K=24) — torchvision is not
available in this image, so the stem and RoIPool are built from torch core
ops (RoIPool via per-box adaptive_max_pool2d, which is its defining
computation).

Writes ``baseline_torch.json`` at the repo root; ``bench.py`` reads it to
compute ``vs_baseline``.

Usage: python scripts/bench_torch_baseline.py [--steps 3] [--batch 5]
"""

import argparse
import json
import os
import platform
import sys
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class BasicBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.c1 = nn.Conv2d(ch, ch, 3, padding=1, bias=False)
        self.b1 = nn.BatchNorm2d(ch)
        self.c2 = nn.Conv2d(ch, ch, 3, padding=1, bias=False)
        self.b2 = nn.BatchNorm2d(ch)

    def forward(self, x):
        y = F.relu(self.b1(self.c1(x)))
        y = self.b2(self.c2(y))
        return F.relu(x + y)


class TorchCoVA(nn.Module):
    """Architecture-equivalent CoVA in pure torch (CPU baseline)."""

    def __init__(self, hidden=384, bbox_hidden=32, n_classes=4, k=24):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False),
            nn.BatchNorm2d(64),
            nn.ReLU(),
            nn.MaxPool2d(3, stride=2, padding=1),
            BasicBlock(64),
            BasicBlock(64),
        )
        n_visual = 64 * 9
        self.bbox_enc = nn.Sequential(
            nn.Linear(5, bbox_hidden), nn.BatchNorm1d(bbox_hidden), nn.ReLU()
        )
        n_feat = n_visual + bbox_hidden
        self.w_i = nn.Linear(n_feat, hidden, bias=False)
        self.w_j = nn.Linear(n_feat, hidden, bias=False)
        self.att = nn.Linear(2 * hidden, 1)
        self.dec = nn.Sequential(
            nn.Dropout(0.2),
            nn.Linear(n_feat + hidden, n_feat + hidden),
            nn.BatchNorm1d(n_feat + hidden),
            nn.ReLU(),
            nn.Dropout(0.2),
            nn.Linear(n_feat + hidden, n_classes),
        )
        self.k = k

    def roi_pool(self, fm_img, boxes, scale=0.25):
        outs = []
        H = fm_img.shape[-1]
        for b in boxes:
            x1, y1, x2, y2 = [int(round(float(v) * scale)) for v in b]
            x2 = max(x2 + 1, x1 + 1)
            y2 = max(y2 + 1, y1 + 1)
            crop = fm_img[:, max(y1, 0) : min(y2, H), max(x1, 0) : min(x2, H)]
            if crop.numel() == 0:
                outs.append(torch.zeros(64, 3, 3))
            else:
                outs.append(F.adaptive_max_pool2d(crop, (3, 3)))
        return torch.stack(outs).flatten(1)

    def forward(self, images, boxes_per_img, ctx):
        fm = self.stem(images)
        vis = torch.cat(
            [
                self.roi_pool(fm[i], boxes_per_img[i])
                for i in range(len(boxes_per_img))
            ]
        )
        flat = torch.cat(boxes_per_img)
        wh = flat[:, 2:] - flat[:, :2]
        bbox5 = torch.cat(
            [flat[:, :2], wh, (wh[:, :1] / wh[:, 1:2])], dim=1
        )
        h = torch.cat([vis, self.bbox_enc(bbox5)], dim=1)
        n, f = h.shape
        h_pad = torch.cat([h, torch.zeros(1, f)], 0)
        h_j = h_pad[ctx.reshape(-1)].reshape(n, self.k, f)
        wh_i = self.w_i(h)
        wh_j = self.w_j(h_j)
        e = self.att(
            torch.cat(
                [wh_i.unsqueeze(1).expand(-1, self.k, -1), wh_j], dim=2
            )
        ).squeeze(2)
        e = F.leaky_relu(e, 0.2)
        e = torch.where(ctx >= 0, e, torch.full_like(e, -9e15))
        a = torch.softmax(e, dim=1)
        ctx_repr = (a.unsqueeze(-1) * wh_j).sum(1)
        return self.dec(torch.cat([h, ctx_repr], dim=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=5)
    ap.add_argument("--boxes", type=int, default=93)
    ap.add_argument("--img", type=int, default=1280)
    ap.add_argument("--infer", action="store_true",
                    help="measure the forward-only serving path "
                         "(model.eval + no_grad) instead of the train step; "
                         "writes baseline_torch_infer.json, the anchor for "
                         "run_infer_bench's vs_baseline")
    args = ap.parse_args()

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    model = TorchCoVA()
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=5e-4, weight_decay=1e-3)
    crit = nn.CrossEntropyLoss(reduction="sum")

    B, N, K = args.batch, args.boxes, 24
    images = torch.from_numpy(
        rng.random((B, 3, args.img, args.img), dtype=np.float32)
    )
    boxes = []
    for _ in range(B):
        xy = rng.uniform(0, args.img - 40, (N, 2))
        wh = rng.uniform(4, 200, (N, 2))
        boxes.append(
            torch.from_numpy(
                np.concatenate([xy, np.minimum(xy + wh, args.img)], 1).astype(
                    np.float32
                )
            )
        )
    offs, ctx_rows = 0, []
    for _ in range(B):
        c = np.full((N, K), -1, np.int64)
        for i in range(N):
            w = list(range(max(0, i - 12), i)) + list(
                range(i + 1, min(N, i + 13))
            )
            c[i, : len(w)] = np.array(w) + offs
        ctx_rows.append(c)
        offs += N
    ctx = torch.from_numpy(np.concatenate(ctx_rows))
    labels = torch.from_numpy(
        rng.integers(0, 4, (B * N,)).astype(np.int64)
    )

    if args.infer:
        model.eval()
        with torch.no_grad():
            _ = model(images, boxes, ctx)  # warmup
            t0 = time.time()
            for _ in range(args.steps):
                _ = model(images, boxes, ctx)
        dt = (time.time() - t0) / args.steps
    else:
        # warmup
        out = model(images, boxes, ctx)
        loss = crit(out, labels)
        loss.backward()
        opt.step()

        t0 = time.time()
        for _ in range(args.steps):
            opt.zero_grad()
            out = model(images, boxes, ctx)
            loss = crit(out, labels)
            loss.backward()
            opt.step()
        dt = (time.time() - t0) / args.steps
    pages_per_sec = B / dt

    result = {
        "metric": (
            "infer_webpages_per_sec" if args.infer
            else "train_webpages_per_sec"
        ),
        "value": pages_per_sec,
        "unit": "pages/s",
        "framework": f"torch-{torch.__version__}-cpu",
        "geometry": {
            "batch": B,
            "img": args.img,
            "boxes_per_page": N,
            "context": K,
        },
        "step_seconds": dt,
        "host": platform.processor() or platform.machine(),
        "cpu_count": os.cpu_count(),
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "baseline_torch_infer.json" if args.infer else "baseline_torch.json",
    )
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
