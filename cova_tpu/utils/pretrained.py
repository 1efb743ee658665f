"""Checksum-pinned pretrained-backbone acquisition and loading.

The reference's default init is ``resnet18(pretrained=True)``
(``/root/reference/models.py:49-51``) — torchvision downloads the ImageNet
state_dict on first use, and the published accuracy numbers assume it. This
build environment has no network egress, so the weights are a user-supplied
artifact; this module makes the offline recipe exact and the load
tamper-evident:

  * ``PRETRAINED_REGISTRY`` pins each supported torchvision checkpoint by
    its canonical download URL and sha256 prefix. torchvision's own
    integrity convention embeds the first 8 hex chars of the file's sha256
    in the filename (``torchvision/models/_api.py`` / ``load_state_dict_
    from_url(check_hash=True)``); the registry pins the same value, so a
    file that torchvision would accept, we accept.
  * ``verify_checkpoint`` hashes the local file and refuses a mismatch.
  * ``load_verified_backbone`` = verify + torch-load + layout port
    (``torch_port.port_backbone_for``) in one call.

Offline acquisition recipe (run on any machine WITH egress, then copy the
file next to the training host):

    # 1. download the canonical file (any of the three equivalent ways)
    wget https://download.pytorch.org/models/resnet18-f37072fd.pth
    #   or: python -c "from torchvision.models import resnet18, \\
    #       ResNet18_Weights; resnet18(weights=ResNet18_Weights.IMAGENET1K_V1)"
    #       (file lands in ~/.cache/torch/hub/checkpoints/)
    # 2. check integrity before copying
    sha256sum resnet18-f37072fd.pth   # must start with f37072fd
    # 3. train with it
    cova train --init_checkpoint path/to/resnet18-f37072fd.pth ...

The loader re-verifies, so step 2 is belt-and-braces.
"""

from __future__ import annotations

import hashlib
import os
from typing import Any, Dict, Mapping, Tuple

# Canonical torchvision ImageNet (IMAGENET1K_V1) checkpoints — the exact
# files ``resnet{18,34,50}(pretrained=True)`` download. URL + hash prefix
# per torchvision's model zoo (the filename suffix IS the sha256 prefix).
PRETRAINED_REGISTRY: Dict[str, Dict[str, Any]] = {
    "resnet18": {
        "file": "resnet18-f37072fd.pth",
        "url": "https://download.pytorch.org/models/resnet18-f37072fd.pth",
        "sha256_prefix": "f37072fd",
        # len(state_dict) for a torchvision ResNet-18: 62 param tensors +
        # 40 BN buffers (running_mean/var) + 20 num_batches_tracked.
        "n_state_entries": 122,
    },
    "resnet34": {
        "file": "resnet34-b627a593.pth",
        "url": "https://download.pytorch.org/models/resnet34-b627a593.pth",
        "sha256_prefix": "b627a593",
        "n_state_entries": 218,
    },
    "resnet50": {
        "file": "resnet50-0676ba61.pth",
        "url": "https://download.pytorch.org/models/resnet50-0676ba61.pth",
        "sha256_prefix": "0676ba61",
        "n_state_entries": 320,
    },
}

# Which registry entry each make_backbone variant initializes from.
BACKBONE_TO_WEIGHTS = {
    "resnet18_stem": "resnet18",
    "resnet18": "resnet18",
    "resnet34_stem": "resnet34",
    "resnet50_stem": "resnet50",
    "resnet50": "resnet50",
}


def sha256_of(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            blk = f.read(chunk)
            if not blk:
                break
            h.update(blk)
    return h.hexdigest()


def verify_checkpoint(path: str, weights_key: str) -> str:
    """Hash ``path`` and check it against the pinned registry entry.

    Returns the full sha256 on success; raises ValueError on mismatch so a
    truncated download or a wrong/poisoned file can never silently
    initialize a training run.
    """
    entry = PRETRAINED_REGISTRY[weights_key]
    digest = sha256_of(path)
    if not digest.startswith(entry["sha256_prefix"]):
        raise ValueError(
            f"checkpoint {path!r} sha256={digest[:16]}… does not match the "
            f"pinned {weights_key} weights ({entry['sha256_prefix']}…, "
            f"canonical file {entry['file']}, {entry['url']}). "
            "Re-download per the recipe in cova_tpu/utils/pretrained.py."
        )
    return digest


def load_verified_backbone(
    backbone: str, path: str, verify: bool = True
) -> Tuple[Dict, Dict]:
    """Verify + load + port a torchvision checkpoint for ``backbone``.

    ``verify=False`` skips the hash pin AND the strict entry-count check
    (fine-tuned/custom/truncated state_dicts with torchvision key layout);
    the port itself still fails loudly on missing keys.
    """
    from .torch_port import load_torch_file, port_backbone_for

    weights_key = BACKBONE_TO_WEIGHTS[backbone]
    if verify:
        verify_checkpoint(path, weights_key)
    sd: Mapping[str, Any] = load_torch_file(path)
    if verify:
        expected = PRETRAINED_REGISTRY[weights_key]["n_state_entries"]
        if len(sd) != expected:
            raise ValueError(
                f"{path!r} has {len(sd)} state-dict entries; the "
                f"{weights_key} architecture has {expected} — wrong file "
                f"for backbone {backbone!r}?"
            )
    return port_backbone_for(backbone, sd)


def resolve_checkpoint(backbone: str, search_dirs=(".", "weights")) -> str:
    """Find the canonical weights file for ``backbone`` in ``search_dirs``
    (the offline drop-in convention). Raises FileNotFoundError with the full
    acquisition recipe if absent."""
    entry = PRETRAINED_REGISTRY[BACKBONE_TO_WEIGHTS[backbone]]
    for d in search_dirs:
        p = os.path.join(d, entry["file"])
        if os.path.exists(p):
            return p
    raise FileNotFoundError(
        f"{entry['file']} not found in {list(search_dirs)}. On a machine "
        f"with network access: wget {entry['url']} ; verify with sha256sum "
        f"(prefix {entry['sha256_prefix']}); copy it here and pass "
        f"--init_checkpoint {entry['file']}."
    )
