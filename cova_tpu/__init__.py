"""CoVA-TPU: TPU-native context-aware webpage object detection framework."""

from .config import CLASS_NAMES, N_CLASSES, SEED, Config

__version__ = "0.1.0"
__all__ = ["Config", "CLASS_NAMES", "N_CLASSES", "SEED"]
