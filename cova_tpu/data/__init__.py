"""Data layer (lazy re-exports — keep package import light)."""

_EXPORTS = {
    "WebDataset": ("dataset", "WebDataset"),
    "DataPipeline": ("pipeline", "DataPipeline"),
    "make_pipelines": ("pipeline", "make_pipelines"),
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    try:
        mod, attr = _EXPORTS[name]
    except KeyError:
        raise AttributeError(name) from None
    import importlib

    return getattr(importlib.import_module(f".{mod}", __name__), attr)
