"""Checkpoint save/load/GC with latest-file resume semantics.

Reference: torch.save of a flat state dict to `logs/{name}/{epoch:05d}.pth`
with regex-based latest discovery (models/modelwrapper.py:88-102) and
`clean_checkpoint.py` retention GC. Here the full train-state pytree is
flattened to path-keyed arrays in one compressed .npz — portable,
torch-free, and restored against a template pytree (shapes validated).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

from .pytree import key_str as _key_str
from .pytree import leaf_paths as _leaf_paths

_CKPT_RE = re.compile(r"^(\d+)\.ckpt\.npz$")


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    leaves = jax.tree.leaves(tree)
    return {path: np.asarray(leaf)
            for path, leaf in zip(_leaf_paths(tree), leaves)}


def save_checkpoint(run_dir: str, epoch: int, state: Any,
                    extra: Optional[Dict[str, Any]] = None) -> str:
    os.makedirs(run_dir, exist_ok=True)
    path = os.path.join(run_dir, f"{epoch:05d}.ckpt.npz")
    flat = _flatten(state)
    if extra:
        for k, v in extra.items():
            flat[f"__extra__/{k}"] = np.asarray(v)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **flat)
    os.replace(tmp, path)  # atomic publish (crash-safe resume)
    return path


def latest_checkpoint(run_dir: str) -> Optional[Tuple[int, str]]:
    """(epoch, path) of the newest checkpoint, or None."""
    if not os.path.isdir(run_dir):
        return None
    best = None
    for f in os.listdir(run_dir):
        m = _CKPT_RE.match(f)
        if m:
            ep = int(m.group(1))
            if best is None or ep > best[0]:
                best = (ep, os.path.join(run_dir, f))
    return best


def load_checkpoint(path: str, template: Any
                    ) -> Tuple[Any, Dict[str, np.ndarray]]:
    """Restore a pytree with the template's structure; returns
    (state, extras)."""
    data = np.load(path)
    leaves_kp, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for kp, tmpl in leaves_kp:
        key = "/".join(_key_str(k) for k in kp)
        if key not in data:
            # forward-compat: state gained a leaf since this checkpoint
            # was written (e.g. lr_scale) — keep the template's value so
            # old runs stay resumable
            print(f"warning: checkpoint {path} missing leaf {key}; "
                  f"keeping the initialized value")
            leaves.append(np.asarray(tmpl))
            continue
        arr = data[key]
        if arr.shape != np.shape(tmpl):
            raise ValueError(
                f"{key}: checkpoint shape {arr.shape} != {np.shape(tmpl)}")
        leaves.append(arr)
    extras = {k[len("__extra__/"):]: data[k]
              for k in data.files if k.startswith("__extra__/")}
    return jax.tree_util.tree_unflatten(treedef, leaves), extras


def clean_checkpoints(base_dir: str, dry_run: bool = False
                      ) -> List[Tuple[str, int]]:
    """Recursively delete all but the latest checkpoint per run dir
    (clean_checkpoint.py). Returns [(path, bytes_freed)]."""
    removed = []
    for root, _dirs, files in os.walk(base_dir):
        ckpts = sorted((int(_CKPT_RE.match(f).group(1)), f)
                       for f in files if _CKPT_RE.match(f))
        for _ep, f in ckpts[:-1]:
            path = os.path.join(root, f)
            size = os.path.getsize(path)
            if not dry_run:
                os.remove(path)
            removed.append((path, size))
    return removed
