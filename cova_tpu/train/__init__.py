"""Training/eval/serving entry points (lazy re-exports — importing this
package must stay free of jax/flax import cost for CLI --help paths)."""

_EXPORTS = {
    "fit": ("trainer", "fit"),
    "evaluate": ("reporting", "evaluate"),
    "predict_pages": ("predict", "predict_pages"),
    "extract_attention": ("extract", "extract_attention"),
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    try:
        mod, attr = _EXPORTS[name]
    except KeyError:
        raise AttributeError(name) from None
    import importlib

    return getattr(importlib.import_module(f".{mod}", __name__), attr)
