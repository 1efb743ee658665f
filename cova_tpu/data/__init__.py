"""Data layer (lazy re-exports)."""

from ..utils.lazy import make_lazy_getattr

_EXPORTS = {
    "WebDataset": ("dataset", "WebDataset"),
    "DataPipeline": ("pipeline", "DataPipeline"),
    "make_pipelines": ("pipeline", "make_pipelines"),
}

__all__ = list(_EXPORTS)
__getattr__ = make_lazy_getattr(_EXPORTS, __name__)
