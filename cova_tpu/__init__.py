"""CoVA-TPU: TPU-native context-aware webpage object detection framework.

Public API surface:

    from cova_tpu import Config, build_model
    from cova_tpu.data import WebDataset, DataPipeline
    from cova_tpu.train import fit, evaluate
"""

from .config import CLASS_NAMES, N_CLASSES, SEED, Config

__version__ = "0.3.0"


def build_model(cfg):
    from .models.cova import build_model as _build

    return _build(cfg)


__all__ = [
    "Config",
    "CLASS_NAMES",
    "N_CLASSES",
    "SEED",
    "build_model",
    "__version__",
]
