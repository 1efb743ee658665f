#!/usr/bin/env python
"""Flagship-geometry ported-checkpoint parity ON CHIP (VERDICT r3 next-5).

The strongest *executable* stand-in for real-dataset accuracy parity (the
CoVA dataset is external — ``/root/reference/constants.py:3`` — and this
environment has no egress): build a reference-shaped torch CoVA at the
FULL flagship geometry (1280^2 input, truncated RN18 stem, hidden 384,
bbox_hidden 32, K=24 — the defaults of ``/root/reference/utils.py:15-32``),
port its state_dict with ``utils.torch_port.port_cova_state_dict``, run our
Flax model on the TPU in the training dtype (bf16), and require

  * a small max logit deviation vs the torch f32 oracle, and
  * 100% retrieval-pick agreement (the argmax-logit box per non-BG class —
    exactly what the eval metric scores at k=1, ``train.py:144-153``).

Writes ``artifacts/$COVA_BATTERY_OUT/parity_flagship.json`` (default
tpu_r5) and prints a summary line.
Run on the chip: ``python scripts/parity_flagship.py [n_pages]``.
"""

import importlib.util
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _load_ref_cova():
    """Import the reference-shaped torch oracle from the parity test module
    (single definition; scripts must not fork its semantics)."""
    spec = importlib.util.spec_from_file_location(
        "torch_parity_oracle",
        os.path.join(REPO, "tests", "test_torch_parity.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.RefCoVA


def main() -> int:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    import torch

    from cova_tpu.config import Config
    from cova_tpu.data.records import build_context_indices
    from cova_tpu.models.cova import build_model
    from cova_tpu.utils.torch_port import port_cova_state_dict

    RefCoVA = _load_ref_cova()
    torch.manual_seed(0)
    rng = np.random.default_rng(0)

    img, n_boxes, cs = 1280, 93, 12  # mean real page: 93 boxes (bbox_stats)
    K = 2 * cs
    ref = RefCoVA(hidden=384, bbox_hidden=32)
    ref.eval()

    # Real-ish DOM box mix, kept in-range (the oracle's crop-pool and
    # torchvision's clip-after-quantize differ off-image; the product
    # kernels' negative-coord parity is pinned separately in tests).
    x1 = rng.uniform(2, img - 130, (n_pages, n_boxes))
    y1 = rng.uniform(2, img - 130, (n_pages, n_boxes))
    w = rng.uniform(8, 120, (n_pages, n_boxes))
    h = rng.uniform(8, 120, (n_pages, n_boxes))
    boxes = np.stack([x1, y1, x1 + w, y1 + h], -1).astype(np.float32)
    images_q = rng.integers(0, 256, (n_pages, img, img, 3), dtype=np.uint8)
    ctx_per_img = build_context_indices(n_boxes, cs)

    t0 = time.time()
    t_images = torch.from_numpy(
        (images_q.astype(np.float32) / 255.0).transpose(0, 3, 1, 2)
    ).contiguous()
    t_boxes = [torch.from_numpy(boxes[i]) for i in range(n_pages)]
    flat_ctx = []
    for i in range(n_pages):
        c = ctx_per_img.copy()
        c[c >= 0] += i * n_boxes
        flat_ctx.append(c)
    t_ctx = torch.from_numpy(np.concatenate(flat_ctx)).long()
    with torch.no_grad():
        want = ref(t_images, t_boxes, t_ctx).numpy()  # [n_pages*n, 4]
    torch_secs = time.time() - t0
    want = want.reshape(n_pages, n_boxes, 4)

    params, stats = port_cova_state_dict(
        ref.state_dict(), use_context=True, bbox_hidden_dim=32
    )
    cfg = Config(img_height=img, context_size=cs, compute_dtype="bfloat16")
    model = build_model(cfg)
    P = cfg.pad_boxes
    pad_boxes = np.zeros((n_pages, P, 4), np.float32)
    pad_boxes[:, :n_boxes] = boxes
    mask = np.zeros((n_pages, P), bool)
    mask[:, :n_boxes] = True
    ctx = np.full((n_pages, P, K), -1, np.int32)
    ctx[:, :n_boxes] = ctx_per_img

    import jax

    t0 = time.time()
    out = model.apply(
        {"params": params, "batch_stats": stats},
        images_q, pad_boxes, mask, ctx, train=False,
    )
    got = np.asarray(out.logits.astype(jax.numpy.float32))[:, :n_boxes]
    tpu_secs = time.time() - t0

    delta = np.abs(got - want)
    scale = np.abs(want).max()
    # Retrieval picks: argmax box per non-BG class per page (k=1 metric).
    picks_ref = want[..., 1:].argmax(axis=1)  # [n_pages, 3]
    picks_got = got[..., 1:].argmax(axis=1)
    agree = float((picks_ref == picks_got).mean())

    result = {
        "geometry": {
            "img": img, "n_boxes": n_boxes, "context_size": cs,
            "hidden": 384, "bbox_hidden": 32, "pages": n_pages,
            "compute_dtype": "bfloat16",
        },
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "max_abs_delta": float(delta.max()),
        "max_rel_delta": float(delta.max() / scale),
        "mean_abs_delta": float(delta.mean()),
        "logit_scale": float(scale),
        "retrieval_pick_agreement": agree,
        "torch_oracle_secs": torch_secs,
        "tpu_secs_incl_compile": tpu_secs,
    }
    out_dir = os.path.join(
        REPO, "artifacts", os.environ.get("COVA_BATTERY_OUT", "tpu_r5")
    )
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "parity_flagship.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))

    ok = agree == 1.0 and result["max_rel_delta"] < 0.05
    print(
        f"parity_flagship: {'OK' if ok else 'FAIL'} — pick agreement "
        f"{agree:.0%}, max rel logit delta {result['max_rel_delta']:.4f} "
        f"(bf16 on {result['backend']})"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
