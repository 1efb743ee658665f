"""PEP-562 lazy re-exports for package ``__init__``s — importing a
package must stay free of jax/flax import cost (CLI --help paths)."""

from __future__ import annotations

import importlib
from typing import Dict, Tuple


def make_lazy_getattr(exports: Dict[str, Tuple[str, str]], pkg: str):
    """Return a module-level ``__getattr__`` resolving ``exports`` entries
    ``name -> (submodule, attr)`` relative to package ``pkg``."""

    def __getattr__(name):
        try:
            mod, attr = exports[name]
        except KeyError:
            raise AttributeError(
                f"module {pkg!r} has no attribute {name!r}"
            ) from None
        return getattr(importlib.import_module(f".{mod}", pkg), attr)

    return __getattr__
