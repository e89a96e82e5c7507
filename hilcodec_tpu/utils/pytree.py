"""Small pytree path utilities shared across the framework."""

from __future__ import annotations

from typing import Any, List

import jax


def key_str(k) -> str:
    """Render one tree-path key (DictKey / SequenceKey / attr) as a str."""
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "idx"):
        return str(k.idx)
    return str(k)


def leaf_paths(tree: Any) -> List[str]:
    """'/'-joined path for every leaf, in tree_flatten order."""
    return ["/".join(key_str(k) for k in kp)
            for kp, _ in jax.tree_util.tree_flatten_with_path(tree)[0]]
