"""Parameter utilities (reference ``count_parameters``, utils.py:37-41)."""

from __future__ import annotations

from typing import Any

import jax


def count_parameters(params: Any) -> int:
    """Total trainable parameter count of a Flax params tree. The flagship
    CoVA configuration yields 1,616,485 — matching the reference's ~1.6M
    (README table; printed at models.py:92)."""
    return sum(x.size for x in jax.tree.leaves(params))


def parameter_overview(params: Any, max_rows: int = 200) -> str:
    """Human-readable per-leaf shape table."""
    lines = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = jax.tree_util.keystr(path)
        lines.append(f"{name:<70} {str(leaf.shape):<18} {leaf.size:>10,}")
        if len(lines) >= max_rows:
            lines.append("...")
            break
    lines.append(f"{'TOTAL':<70} {'':<18} {count_parameters(params):>10,}")
    return "\n".join(lines)
