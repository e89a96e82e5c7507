"""Debug helpers: non-finite scanners, divergence probes, file logger.

Reference: utils/debug.py (NaN grad scanner, DDP unused-param finder, file
logger). The DDP unused-parameter problem doesn't exist under jax.grad
(every leaf gets a gradient); its analogue here is `find_zero_grads` —
leaves whose gradient is identically zero, usually a disconnected module.
"""

from __future__ import annotations

import datetime
import os
from typing import Any, List

import numpy as np


def _paths_where(tree: Any, pred) -> List[str]:
    import jax
    out = []
    for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if pred(np.asarray(leaf)):
            out.append("/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                                for k in kp))
    return out


def find_nonfinite(tree: Any) -> List[str]:
    """Leaves containing NaN/Inf (check_grad analogue)."""
    return _paths_where(tree, lambda a: a.size and not np.isfinite(a).all())


def find_zero_grads(grads: Any) -> List[str]:
    """Gradient leaves that are identically zero — the functional analogue
    of the DDP unused-parameter finder (utils/debug.py:24-39)."""
    return _paths_where(grads, lambda a: a.size and not np.any(a))


class FileLogger:
    """Append-only timestamped run log (utils/debug.py file logger)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path

    def log(self, msg: str) -> None:
        stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
        with open(self.path, "a") as f:
            f.write(f"[{stamp}] {msg}\n")
